"""Build dist/docling_spark.zip for spark-submit --py-files.

Usage: python jobs/package_pyfiles.py [out_zip]
"""

from __future__ import annotations

import sys
import zipfile
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def build(out: Path) -> Path:
    out.parent.mkdir(parents=True, exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((REPO / "docling_spark").rglob("*.py")):
            zf.write(py, py.relative_to(REPO))
    return out


if __name__ == "__main__":
    dest = Path(sys.argv[1]) if len(sys.argv) > 1 else REPO / "dist" / "docling_spark.zip"
    print(build(dest))
