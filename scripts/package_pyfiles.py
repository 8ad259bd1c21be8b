"""Build the spark-submit --py-files artifact.

The north rule ships the engine as ``spark-submit --py-files`` modules: one
zip containing the ``plateau_gis_converter_spark`` package, importable on
driver and executors alike (reference distributes a single ``nusamai``
binary; the Spark-native equivalent is a py-files archive + a thin driver
script, see ``scripts/submit_job.py``).

The zip is deterministic — sorted member order, fixed timestamps, no
bytecode — so the artifact hash is stable across builds (reproducible
deploys; a re-run of the packaging step on unchanged sources produces a
byte-identical archive).

Usage:
    python scripts/package_pyfiles.py [--out dist/plateau_gis_converter_spark.zip]
"""

from __future__ import annotations

import argparse
import hashlib
import os
import zipfile

PKG = "plateau_gis_converter_spark"
# fixed timestamp for reproducibility (zipfile's epoch floor is 1980)
_ZIP_DATE = (1980, 1, 1, 0, 0, 0)


def build_zip(repo_root: str, out_path: str) -> str:
    """Zip the package sources; returns the sha256 of the artifact."""
    pkg_root = os.path.join(repo_root, PKG)
    members = []
    for dirpath, dirnames, filenames in os.walk(pkg_root):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        for fn in sorted(filenames):
            if fn.endswith(".py"):
                full = os.path.join(dirpath, fn)
                arc = os.path.relpath(full, repo_root)
                members.append((full, arc))
    if not members:
        raise SystemExit(f"no package sources found under {pkg_root}")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_DEFLATED) as zf:
        for full, arc in members:
            with open(full, "rb") as f:
                data = f.read()
            info = zipfile.ZipInfo(arc.replace(os.sep, "/"), date_time=_ZIP_DATE)
            info.compress_type = zipfile.ZIP_DEFLATED
            info.external_attr = 0o644 << 16
            zf.writestr(info, data)
    with open(out_path, "rb") as f:
        return hashlib.sha256(f.read()).hexdigest()


def main() -> None:
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(repo_root, "dist",
                                                  f"{PKG}.zip"))
    args = ap.parse_args()
    digest = build_zip(repo_root, args.out)
    print(f"{args.out} sha256={digest}")


if __name__ == "__main__":
    main()
