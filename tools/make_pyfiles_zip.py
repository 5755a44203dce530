"""Build dist/pdor_spark.zip for spark-submit --py-files."""

from __future__ import annotations

import os
import zipfile

PKG = "pdf_drawing_ocr_recognition_spark"


def build(out: str = "dist/pdor_spark.zip") -> str:
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with zipfile.ZipFile(out, "w", zipfile.ZIP_DEFLATED) as z:
        for root, _dirs, files in os.walk(PKG):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    path = os.path.join(root, f)
                    z.write(path, path)
    return out


if __name__ == "__main__":
    print(build())
