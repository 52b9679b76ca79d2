"""Build dist/track0s.zip for ``spark-submit --py-files`` shipping
(BASELINE.json:6). Contains the pure core, the Spark engine, the
datagen, and the reference oracle so executors can import everything.

    python tools/make_dist.py
    spark-submit --py-files dist/track0s.zip jobs/crawl.py --pages ... --ckpt ...
"""

from __future__ import annotations

import os
import sys
import zipfile

PACKAGES = ["track0s", "track0_spark", "datagen", "reference_impl"]


def main() -> int:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(root, "dist"), exist_ok=True)
    out = os.path.join(root, "dist", "track0s.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for pkg in PACKAGES:
            for dirpath, _dirs, files in os.walk(os.path.join(root, pkg)):
                if "__pycache__" in dirpath:
                    continue
                for f in files:
                    if f.endswith(".py"):
                        full = os.path.join(dirpath, f)
                        z.write(full, os.path.relpath(full, root))
    print(out)
    return 0


if __name__ == "__main__":
    sys.exit(main())
