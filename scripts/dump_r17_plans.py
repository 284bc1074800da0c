"""Dump explain('formatted') for named queries into plans/r17/.

Usage: python scripts/dump_r17_plans.py <repo_root> <suffix> q [q ...]
Writes <out_repo>/plans/r17/<q>_<suffix>.txt — always into
/root/repo/plans/r17 regardless of which checkout the engine code is
imported from, so `_before` can be generated from a pristine worktree.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

root = sys.argv[1]
suffix = sys.argv[2]
names = sys.argv[3:]
sys.path.insert(0, root)

from etl_btc_spark.plans.queries import REGISTRY  # noqa: E402
from etl_btc_spark.session import get_spark  # noqa: E402

OUT = "/root/repo/plans/r17"
SF = "/root/testdata/sf0.001"


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark("dump-r17-plans")
    for n in names:
        df = REGISTRY[n].fn(spark, SF)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT, f"{n}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print(f"wrote {n}_{suffix}.txt")


if __name__ == "__main__":
    main()
