"""Dump `.explain("formatted")` for registry queries to files.

Usage: python tools/qplan.py OUT_DIR SUFFIX [sf_dir] query [query...]
Writes OUT_DIR/<query>_<SUFFIX>.txt for each query (the judge-checkable
plan evidence convention: plans/r16/<query>_{before,after}.txt).
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> None:
    out_dir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = "/root/testdata/sf0.1"
    if rest and os.path.isdir(rest[0]):
        sf_dir = rest[0]
        rest = rest[1:]
    names = rest

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from ekati_spark.session import get_spark
    import ekati_spark.queries as Q

    spark = get_spark("ekati_qplan")
    os.makedirs(out_dir, exist_ok=True)
    for name in names:
        df = Q.REGISTRY[name].fn(spark, sf_dir)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(buf.getvalue())
        print(f"wrote {path} ({len(buf.getvalue())} chars)")


if __name__ == "__main__":
    main()
