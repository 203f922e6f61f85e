#!/usr/bin/env python
"""Package the engine for spark-submit --py-files (north_rule deployment).

Builds dist/jsons_to_schema_spark.zip containing the pure-Python package —
executors import it from the zip; no install step on the cluster.
"""

from __future__ import annotations

import zipfile
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
PKG = ROOT / "jsons_to_schema_spark"
DIST = ROOT / "dist"


def build() -> Path:
    DIST.mkdir(exist_ok=True)
    out = DIST / "jsons_to_schema_spark.zip"
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as zf:
        for pattern in ("*.py", "*.json"):  # code + packaged data (oracle pins)
            for p in sorted(PKG.rglob(pattern)):
                zf.write(p, p.relative_to(ROOT))
    return out


if __name__ == "__main__":
    print(build())
