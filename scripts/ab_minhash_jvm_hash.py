"""A/B (r17): MinHash shingle hashing — Python md5 (current) vs JVM
md5 builtin feeding the pandas UDF pre-hashed int arrays.

Same digest function, same shingle strings, identical signatures —
the only question is where the 32-bit-md5-prefix work runs: in the
Python worker (hashlib per shingle behind an LRU) or in the JVM scan
stage (md5/substring/conv codegen inside a transform()), with only
array<bigint> crossing the Arrow boundary instead of the full
shingle strings.

Usage: python scripts/ab_minhash_jvm_hash.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402
from pyspark.sql import types as T  # noqa: E402

from etl_btc_spark.operators import dedup as DD  # noqa: E402
from etl_btc_spark.operators.dedup import (  # noqa: E402
    _MERSENNE,
    _minhash_params,
    release_scoped_caches,
)
from etl_btc_spark.operators.textops import normalize_text, ws_tokens  # noqa: E402
from etl_btc_spark.session import get_spark  # noqa: E402
from etl_btc_spark.tables import load_table  # noqa: E402


def jvm_hashed_banded(docs, n_hashes=32, n_bands=8, ngram=3, seed=7):
    params = _minhash_params(n_hashes, seed)
    A = np.array([a for a, _ in params], dtype=np.uint64)[:, None]
    B = np.array([b for _, b in params], dtype=np.uint64)[:, None]

    @F.pandas_udf(T.ArrayType(T.LongType()))
    def sig_from_hashes(hashes: pd.Series) -> pd.Series:
        out = []
        for arr in hashes:
            if arr is None or len(arr) == 0:
                out.append([_MERSENNE] * len(A))
                continue
            h = np.asarray(arr, dtype=np.uint64)
            sig = ((A * h[None, :] + B) % np.uint64(_MERSENNE)).min(axis=1)
            out.append(sig.astype(np.int64).tolist())
        return pd.Series(out)

    sh = DD.word_shingles(F.col("text"), ngram)
    hashed = F.transform(
        sh,
        lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("bigint"),
    )
    sig = sig_from_hashes(hashed)
    base = DD.spread(docs)
    return base.select(F.col("doc_id"), sig.alias("sig")).select(
        "doc_id",
        F.explode(DD.band_keys(F.col("sig"), n_hashes, n_bands)).alias("bkey"),
    )


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("ab-minhash-jvm-hash")
    docs = load_table(spark, sf, "documents").select("doc_id", "text")

    def noop(df):
        df.write.mode("overwrite").format("noop").save()

    cur = lambda: noop(  # noqa: E731
        DD._minhash_banded(docs, "doc_id", "text", 32, 8, 3)
    )
    new = lambda: noop(jvm_hashed_banded(docs))  # noqa: E731

    # value identity first: both banded tables must be row-identical
    a = DD._minhash_banded(docs, "doc_id", "text", 32, 8, 3)
    b = jvm_hashed_banded(docs)
    diff = a.exceptAll(b).count() + b.exceptAll(a).count()
    print(f"row diff (must be 0): {diff}")
    release_scoped_caches()

    cur()
    new()
    ta, tb = [], []
    for _ in range(4):
        t0 = time.time()
        cur()
        ta.append(time.time() - t0)
        release_scoped_caches()
        t0 = time.time()
        new()
        tb.append(time.time() - t0)
        release_scoped_caches()
    print(f"python-md5 banded pass: best {min(ta):.3f} all {[round(x,3) for x in ta]}")
    print(f"jvm-md5    banded pass: best {min(tb):.3f} all {[round(x,3) for x in tb]}")


if __name__ == "__main__":
    main()
