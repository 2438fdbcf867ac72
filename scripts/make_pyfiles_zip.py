"""Build ftc_engine.zip for spark-submit --py-files (north_rule shipping)."""

from __future__ import annotations

import os
import sys
import zipfile


def main(out: str = "ftc_engine.zip") -> None:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with zipfile.ZipFile(out, "w") as z:
        pkg = os.path.join(root, "find_that_charity_spark")
        for dirpath, _dirs, files in os.walk(pkg):
            for fn in files:
                if fn.endswith(".py"):
                    full = os.path.join(dirpath, fn)
                    z.write(full, os.path.relpath(full, root))
    print(out)


if __name__ == "__main__":
    main(*sys.argv[1:])
