"""CLI mirror workflow acceptance: crawl --saved-out/--mirror-out, then
--update revisit against the same pages snapshot (S3/S4 end-to-end
through jobs/crawl.py, the surface a track0 user actually drives).

Runs the CLI as a SUBPROCESS: jobs/crawl.py builds and stops its own
SparkSession, and in-process getOrCreate would hand it the suite's
shared fixture session — whose stop() then kills every Spark test
scheduled after this one (r2 review: 41 downstream failures)."""

import json
import os
import subprocess
import sys

import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_cli(argv):
    proc = subprocess.run(
        [sys.executable, os.path.join(_REPO, "jobs", "crawl.py"), *argv],
        capture_output=True,
        text=True,
        cwd=_REPO,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    return json.loads(proc.stdout.strip().splitlines()[-1])


def test_crawl_mirror_then_update(tmp_path):
    saved_out = str(tmp_path / "saved.parquet")
    mirror_out = str(tmp_path / "mirror")

    summary = _run_cli(
        [
            "--profile", "sf-unit", "--rounds", "6", "--cores", "4",
            "--head", "0", "--saved-out", saved_out,
            "--mirror-out", mirror_out,
        ]
    )
    assert summary["fetched"] > 0
    t = pq.read_table(saved_out)
    assert sorted(t.column_names) == [
        "etag", "html", "last_modified", "url_canon"
    ]
    n_saved = t.num_rows
    assert n_saved > 0
    assert summary["mirror_files"] == n_saved
    files = [
        os.path.join(r, f)
        for r, _, fs in os.walk(mirror_out)
        for f in fs
    ]
    assert len(files) == n_saved
    assert all(os.path.getsize(f) > 0 for f in files)

    # revisit against the SAME pages snapshot: every row is a 304-analog
    # (ts unchanged -> 'unchanged'); the saved set is rewritten
    # recoverably with identical content and the mirror re-materializes
    # the same file set
    upd = _run_cli(
        [
            "--profile", "sf-unit", "--update",
            "--cores", "4", "--saved-out", saved_out,
            "--mirror-out", mirror_out,
        ]
    )
    assert upd["update"] == {"unchanged": n_saved}
    assert upd["mirror_files"] == n_saved
    t2 = pq.read_table(saved_out).sort_by("url_canon")
    t1 = t.sort_by("url_canon")
    assert t1.equals(t2)


def test_update_recovers_torn_swap(tmp_path):
    """Regression (ADVICE r2): a kill between os.replace(path, bak) and
    os.replace(tmp, path) in _write_parquet_recoverable leaves the saved
    set only at path+'.bak' (and/or a complete path+'.tmp'); a later
    --update must auto-recover instead of hard-failing."""
    saved_out = str(tmp_path / "saved.parquet")
    _run_cli(
        [
            "--profile", "sf-unit", "--rounds", "4", "--cores", "4",
            "--head", "0", "--saved-out", saved_out,
        ]
    )
    t = pq.read_table(saved_out)

    # simulate the kill window: old set shunted to .bak, no new tmp
    os.replace(saved_out, saved_out + ".bak")
    upd = _run_cli(
        ["--profile", "sf-unit", "--update", "--cores", "4",
         "--saved-out", saved_out]
    )
    assert upd["update"].get("unchanged", 0) == t.num_rows
    assert os.path.exists(saved_out)
    assert not os.path.exists(saved_out + ".bak")

    # simulate the later kill window: new COMPLETE tmp (with _SUCCESS),
    # old set at .bak — the finished new set must win
    os.replace(saved_out, saved_out + ".tmp")
    assert os.path.exists(saved_out + ".tmp/_SUCCESS")
    upd2 = _run_cli(
        ["--profile", "sf-unit", "--update", "--cores", "4",
         "--saved-out", saved_out]
    )
    assert upd2["update"].get("unchanged", 0) == t.num_rows
    assert os.path.exists(saved_out)
