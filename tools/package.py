#!/usr/bin/env python3
"""Build dist/docling_gfcr_spark.zip for spark-submit --py-files.

The zip contains the pure-Python package only (kernels + pipeline +
operators); executors need nothing else — no native libs, no pip installs
(the design constraint that keeps extraction kernels stdlib-only).
"""

from __future__ import annotations

import os
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def build() -> str:
    dist = os.path.join(REPO, "dist")
    os.makedirs(dist, exist_ok=True)
    out = os.path.join(dist, "docling_gfcr_spark.zip")
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        pkg = os.path.join(REPO, "docling_gfcr_spark")
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in sorted(files):
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))
    return out


if __name__ == "__main__":
    path = build()
    print(path)
