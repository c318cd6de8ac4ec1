#!/usr/bin/env python
"""Package cep_spark for spark-submit --py-files."""

import os
import sys
import zipfile

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cep_spark.zip"
ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

with zipfile.ZipFile(OUT, "w", zipfile.ZIP_DEFLATED) as z:
    pkg = os.path.join(ROOT, "cep_spark")
    for dirpath, _, files in os.walk(pkg):
        if "__pycache__" in dirpath:
            continue
        for f in files:
            if f.endswith(".py"):
                full = os.path.join(dirpath, f)
                z.write(full, os.path.relpath(full, ROOT))
print(OUT)
