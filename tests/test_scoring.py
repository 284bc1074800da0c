"""Scoring surface (U1-U6) — stub/HF engine selection and failure
semantics. The engine="hf" path is capability-gated; round 7 commits
a deterministic pure-numpy pipeline artifact (operators/minilm.py) so
that path RUNS here despite the absent transformers stack. The STUB
path must stay byte-identical to what the q32 oracle checks
regardless of which hf backend is available."""

import pandas as pd
import pytest

from pyspark.sql import functions as F

from etl_btc_spark.operators import scoring as SC


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [1, 2, 3, 4],
                # len 29 ("x" * 29) trips the stub's simulated failure
                "text": ["bullish breakout", "x" * 29, "bearish slide", "flat"],
            }
        )
    )


def test_stub_default_unchanged_and_null_semantics(spark, docs):
    """engine defaults to the stub scorers — the oracle-checked path.
    A stub failure row NULLs that model everywhere, and a row where
    every model fails is dropped by the >=1-success rule."""
    out = SC.score_documents(docs).orderBy("doc_id").collect()
    # doc 2 (len 29): len % 29 == 0 for ALL salts -> every model NULL
    assert [r["doc_id"] for r in out] == [1, 3, 4]
    expect = SC.stub_model_fn(pd.Series(["bullish breakout"]), salt=0)
    assert out[0]["cryptobert_label"] == expect["label"].iloc[0]
    assert out[0]["cryptobert_score"] == pytest.approx(expect["score"].iloc[0])


def test_auto_engine_falls_back_to_stub_when_hf_missing(spark, docs, monkeypatch):
    """With the capability gate forced off (r7: the committed minilm
    artifact makes hf_available() true here, so the missing-capability
    branch needs an injected gate), auto must produce the stub rows."""
    monkeypatch.setattr(SC, "hf_available", lambda model=None: False)
    stub = SC.score_documents(docs).orderBy("doc_id").collect()
    auto = SC.score_documents(docs, engine="auto").orderBy("doc_id").collect()
    assert [tuple(r) for r in auto] == [tuple(r) for r in stub]


def test_hf_engine_fails_fast_when_unavailable(spark, docs, monkeypatch):
    monkeypatch.setattr(SC, "hf_available", lambda model=None: False)
    with pytest.raises(RuntimeError, match="transformers"):
        SC.score_documents(docs, engine="hf")


def test_custom_model_fn_failure_rows_null(spark, docs):
    """U6 with an injected kernel: a model_fn that fails half its rows
    must NULL exactly those rows through the struct UDF."""
    def flaky(texts: pd.Series) -> pd.DataFrame:
        out = pd.DataFrame(
            {"label": ["Positive"] * len(texts), "score": [0.5] * len(texts)}
        )
        bad = texts.str.len() > 10
        out.loc[bad.to_numpy(), "label"] = None
        out.loc[bad.to_numpy(), "score"] = None
        out.index = texts.index
        return out

    udf = SC.sentiment_udf(model_fn=flaky)
    got = (
        docs.select("doc_id", udf(F.col("text")).alias("s"))
        .select("doc_id", "s.label", "s.score")
        .orderBy("doc_id")
        .collect()
    )
    assert [(r["label"], r["score"]) for r in got] == [
        (None, None),  # len 16
        (None, None),  # len 29
        (None, None),  # len 13
        ("Positive", 0.5),  # len 4
    ]


@pytest.mark.skipif(
    not SC.hf_available("cryptobert"),
    reason="no transformers stack and no committed minilm artifact",
)
def test_hf_real_path_schema_and_null_on_failure(spark, docs):
    """The engine="hf" pipeline path must return the declared struct
    schema, remapped labels, and NULL-only-the-bad-row semantics.
    Round 7: this RUNS here — without transformers the committed
    pure-numpy minilm artifact backs _hf_pipe via the same pipeline
    contract, so hf_model_fn's tokenize→batch→remap path executes
    for real instead of skipping."""
    out = SC.score_documents(docs, engine="hf", models=("cryptobert", "finbert"))
    kinds = dict(out.dtypes)
    assert kinds["cryptobert_label"] == "string"
    assert kinds["cryptobert_score"] == "double"
    rows = out.collect()
    assert 0 < len(rows) <= 4
    for r in rows:
        for m in ("cryptobert", "finbert"):
            lab = r[f"{m}_label"]
            assert lab is None or lab in ("Positive", "Negative", "Neutral")
            sc = r[f"{m}_score"]
            assert sc is None or 0.0 <= sc <= 1.0


def test_mini_artifact_deterministic(tmp_path):
    """The committed minilm artifacts must be reproducible from
    scripts/make_mini_hf.py at the recorded seed — the 'built once by
    a script, deterministic' contract. Weights compare exactly;
    config/vocab compare byte-for-byte."""
    import json
    import os
    import sys

    import numpy as np

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import make_mini_hf as MK

    from etl_btc_spark.operators import minilm

    for model_id in SC.HF_MODEL_IDS.values():
        committed = minilm.artifact_dir(model_id)
        with open(os.path.join(committed, "config.json")) as f:
            cfg = json.load(f)
        rebuilt = MK.build(
            model_id,
            cfg["mini_seed"],
            {int(k): v for k, v in cfg["id2label"].items()},
            out=str(tmp_path / model_id.replace("/", "__")),
        )
        for fname in ("config.json", "vocab.txt"):
            with open(os.path.join(committed, fname), "rb") as a, open(
                os.path.join(rebuilt, fname), "rb"
            ) as b:
                assert a.read() == b.read(), (model_id, fname)
        wa = np.load(os.path.join(committed, "weights.npz"))
        wb = np.load(os.path.join(rebuilt, "weights.npz"))
        assert sorted(wa.files) == sorted(wb.files)
        for k in wa.files:
            assert np.array_equal(wa[k], wb[k]), (model_id, k)


def test_mini_pipeline_contract_and_tokenizer():
    """Pipeline-contract unit pins: truncation to max_length,
    deterministic output, batch-size invariance, WordPiece continuation
    pieces, and label/score ranges — the mechanics hf_model_fn relies
    on when this engine backs _hf_pipe."""
    from etl_btc_spark.operators import minilm

    d = minilm.artifact_dir(SC.HF_MODEL_IDS["cryptobert"])
    pipe = minilm.load_pipeline(d, 64)

    # WordPiece: 'bullish' = 'bull' + '##ish' via greedy longest-match
    assert minilm.wordpiece_tokenize("bullish", pipe.vocab) == ["bull", "##ish"]
    # unknown codepoint collapses the word to [UNK], not a crash
    assert minilm.wordpiece_tokenize("b€d ok", pipe.vocab)[0] == "[UNK]"

    rows = ["bullish breakout", "bearish slide", "x" * 500, "", "flat"]
    out = pipe(rows, batch_size=2)
    # batch-size invariance: labels exact, scores to float32-GEMM
    # tolerance (BLAS blocking differs by batch shape — true of real
    # HF pipelines too); identical batching is exactly reproducible
    out32 = pipe(rows, batch_size=32)
    assert [o["label"] for o in out] == [o["label"] for o in out32]
    assert all(abs(a["score"] - b["score"]) < 1e-5 for a, b in zip(out, out32))
    assert out == pipe(rows, batch_size=2)  # deterministic
    for o in out:
        assert o["label"] in ("Bullish", "Bearish", "Neutral")
        assert 0.0 < o["score"] <= 1.0
    # truncation: a 500-char doc encodes to exactly max_length ids
    assert len(pipe.encode("x" * 500)) == 64


def test_hf_model_fn_per_row_fallback_isolates_bad_doc():
    """hf_model_fn's batch-failure path: when the pipeline raises on a
    batch, it retries row-by-row so only the poisoned row NULLs — the
    reference's per-article error-continue (news_etl_dag.py:100-118).
    Injected via the module pipe cache, so no transformers needed."""
    import pandas as pd

    class Poisoned:
        def __call__(self, rows, batch_size=32):
            if any("BAD" in r for r in rows):
                raise RuntimeError("poisoned doc")
            return [{"label": "Bullish", "score": 0.9} for _ in rows]

    key = ("fake/poisoned", 64)
    SC._HF_PIPES[key] = Poisoned()
    try:
        fn = SC.hf_model_fn("fake/poisoned")
        out = fn(pd.Series(["good one", "BAD doc", "another good"]))
        assert list(out["label"]) == ["Positive", None, "Positive"]
        assert out["score"].iloc[0] == 0.9 and pd.isna(out["score"].iloc[1])
    finally:
        SC._HF_PIPES.pop(key, None)


def test_hf_scoring_label_spread_and_oracle_isolation(spark, docs):
    """engine='hf' must not leak into the oracle-checked default: the
    stub rows for q32's fixture stay identical after an hf run, and
    the hf run itself exercises >1 distinct label over the fixture
    (a constant-label scorer would mean the forward pass ignores its
    input)."""
    before = SC.score_documents(docs).orderBy("doc_id").collect()
    hf = SC.score_documents(docs, engine="hf", models=("cryptobert",)).collect()
    labels = {r["cryptobert_label"] for r in hf}
    assert len(labels) > 1, labels
    after = SC.score_documents(docs).orderBy("doc_id").collect()
    assert [tuple(r) for r in before] == [tuple(r) for r in after]


def test_score_documents_refuses_output_column_clash(spark, docs):
    """r18 (ADVICE r17): mapInPandas APPENDS schema fields, so
    re-scoring an already-scored frame would emit duplicate-named
    columns (the old withColumn path silently replaced them) — the
    clash must be refused up front."""
    scored = SC.score_documents(docs)
    with pytest.raises(ValueError, match="already carries"):
        SC.score_documents(scored)
    # a clash on ANY selected model's columns is enough
    one = docs.withColumn("finbert_score", F.lit(0.5))
    with pytest.raises(ValueError, match="finbert_score"):
        SC.score_documents(one)


def test_q43_query_doc_all_models_fail(spark, monkeypatch):
    """r18 (VERDICT r17 'What's wrong' #1): q43's query vector comes
    from doc 0 of the >=1-success-FILTERED set, matching the oracle's
    q CTE. When doc 0's cleaned text trips every stub model (length %
    29 == 0), the query side must be EMPTY and the whole tally empty —
    not a full top-10 over an unfiltered query row."""
    import pandas as pd

    from etl_btc_spark.plans import queries as QQ

    docs = spark.createDataFrame(
        pd.DataFrame(
            {
                "doc_id": [0, 1, 2, 3],
                # doc 0: len 29 -> every model fails -> dropped by the
                # >=1-success rule; html_strip leaves plain text as-is
                "text": ["x" * 29, "bullish breakout", "bearish slide", "flat"],
            }
        )
    )
    monkeypatch.setattr(
        QQ, "load_table", lambda _spark, _sf, name: docs
    )
    out = QQ.REGISTRY["q43_news_pipeline"].fn(spark, "/nonexistent").collect()
    assert out == []
