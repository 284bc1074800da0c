"""Dump explain('formatted') for named queries into plans/<round>/.

Generalized r18 successor of dump_r17_plans.py.

Usage: python scripts/dump_round_plans.py <repo_root> <round> <suffix> q [q ...]
Writes /root/repo/plans/<round>/<q>_<suffix>.txt — always into the
LIVE repo's plans dir regardless of which checkout the engine code is
imported from, so `_before` can be generated from a pristine worktree
of the round-start commit.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

root = sys.argv[1]
rnd = sys.argv[2]
suffix = sys.argv[3]
names = sys.argv[4:]
sys.path.insert(0, root)

from etl_btc_spark.plans.queries import REGISTRY  # noqa: E402
from etl_btc_spark.session import get_spark  # noqa: E402

OUT = f"/root/repo/plans/{rnd}"
SF = "/root/testdata/sf0.001"


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    spark = get_spark(f"dump-{rnd}-plans")
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
