"""Build the --py-files artifact for cluster submission.

Zips the ``nem_mms_spark`` package (sources only, deterministic order and
timestamps so the artifact hash is stable for cache/lineage purposes) and
prints the spark-submit command that runs the encode CLI on a cluster:

    python tools/make_submit_zip.py --out /tmp/nem_mms_spark.zip

    spark-submit --py-files /tmp/nem_mms_spark.zip \
        --master <cluster-master> \
        cli_submit.py encode --input <table-dir> --out <depot-dir>

The CLI module itself is importable from the zip (``python -m
nem_mms_spark.cli``), so the driver script can be a two-liner; `--deploy`
writes that shim next to the zip.
"""

from __future__ import annotations

import argparse
import os
import zipfile

_PKG = "nem_mms_spark"
_SHIM = """\
# spark-submit driver shim: the package rides in via --py-files
from nem_mms_spark.cli import main
import sys

sys.exit(main())
"""


def build_zip(repo_root: str, out_path: str) -> list[str]:
    """Deterministic package zip: sorted member order, fixed timestamps."""
    pkg_dir = os.path.join(repo_root, _PKG)
    members = []
    for root, dirs, files in os.walk(pkg_dir):
        dirs[:] = sorted(d for d in dirs if d != "__pycache__")
        for f in sorted(files):
            if f.endswith((".py", ".c")):  # .c: native kernel source
                full = os.path.join(root, f)
                members.append((full, os.path.relpath(full, repo_root)))
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            with open(full, "rb") as fh:
                data = fh.read()
            info = zipfile.ZipInfo(arc, date_time=(2020, 1, 1, 0, 0, 0))
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    return [arc for _full, arc in members]


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default="/tmp/nem_mms_spark.zip")
    ap.add_argument(
        "--deploy", action="store_true",
        help="also write the cli_submit.py driver shim next to the zip",
    )
    args = ap.parse_args()
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    members = build_zip(repo_root, args.out)
    print(f"wrote {args.out} ({len(members)} modules)")
    if args.deploy:
        shim = os.path.join(os.path.dirname(args.out), "cli_submit.py")
        with open(shim, "w") as f:
            f.write(_SHIM)
        print(f"wrote {shim}")
    print(
        "submit: spark-submit --py-files "
        f"{args.out} cli_submit.py encode --input <table> --out <depot>"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
