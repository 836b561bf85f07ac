"""Package go_crawler_spark for spark-submit --py-files (SURVEY.md §7 M5).

Usage: python tools/make_pyfiles_zip.py [out_zip]
Produces dist/go_crawler_spark.zip containing the package (no tests,
no bytecode). Launch on a cluster with:

  spark-submit --py-files dist/go_crawler_spark.zip scripts/run_crawl.py \
      --corpus /path/corpus.parquet --robots /path/robots.parquet \
      --store /path/store --rounds 32
"""

from __future__ import annotations

import os
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "dist", "go_crawler_spark.zip"
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pkg = os.path.join(REPO, "go_crawler_spark")
    n = 0
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                # .py modules plus packaged config data (settings/*.yaml —
                # read zip-safely via importlib.resources)
                if not (f.endswith(".py") or f.endswith(".yaml")):
                    continue
                full = os.path.join(root, f)
                arc = os.path.relpath(full, REPO)
                zf.write(full, arc)
                n += 1
    print(f"{out}: {n} files")


if __name__ == "__main__":
    main()
