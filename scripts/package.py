"""Build the --py-files artifact: dist/jsonschema_spark.zip.

Plain zip of the package tree (pure Python, no build step) — importable
by executors when shipped with ``spark-submit --py-files``.
"""

from __future__ import annotations

import pathlib
import sys
import zipfile


def build(out_dir: str = "dist") -> str:
    root = pathlib.Path(__file__).resolve().parent.parent
    pkg = root / "jsonschema_spark"
    out = root / out_dir
    out.mkdir(exist_ok=True)
    target = out / "jsonschema_spark.zip"
    with zipfile.ZipFile(target, "w", zipfile.ZIP_DEFLATED) as z:
        for path in sorted(pkg.rglob("*.py")):
            z.write(path, path.relative_to(root))
    return str(target)


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist"))
