"""CLI mirror workflow acceptance: crawl --saved-out/--mirror-out, then
--update revisit against the same pages snapshot (S3/S4 end-to-end
through jobs/crawl.py, the surface a track0 user actually drives)."""

import json
import os

import pyarrow.parquet as pq


def _run_cli(argv, capsys):
    from jobs.crawl import main

    rc = main(argv)
    out = capsys.readouterr().out
    assert rc == 0, out
    return json.loads(out.strip().splitlines()[-1])


def test_crawl_mirror_then_update(tmp_path, capsys):
    saved_out = str(tmp_path / "saved.parquet")
    mirror_out = str(tmp_path / "mirror")

    summary = _run_cli(
        [
            "--profile", "sf-unit", "--rounds", "6", "--cores", "4",
            "--head", "0", "--saved-out", saved_out,
            "--mirror-out", mirror_out,
        ],
        capsys,
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
    # (ts unchanged -> 'unchanged'); the saved set is atomically
    # rewritten with identical content and the mirror re-materializes
    # the same file set
    upd = _run_cli(
        [
            "--profile", "sf-unit", "--update",
            "--cores", "4", "--saved-out", saved_out,
            "--mirror-out", mirror_out,
        ],
        capsys,
    )
    assert upd["update"] == {"unchanged": n_saved}
    assert upd["mirror_files"] == n_saved
    t2 = pq.read_table(saved_out).sort_by("url_canon")
    t1 = t.sort_by("url_canon")
    assert t1.equals(t2)
