#!/usr/bin/env python
"""Zip the engine for spark-submit --py-files distribution."""

from __future__ import annotations

import zipfile
from pathlib import Path


def main() -> str:
    root = Path(__file__).parent
    dist = root / "dist"
    dist.mkdir(exist_ok=True)
    out = dist / "httrack2warc_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for py in sorted((root / "httrack2warc_spark").rglob("*.py")):
            zf.write(py, py.relative_to(root))
    print(out)
    return str(out)


if __name__ == "__main__":
    main()
