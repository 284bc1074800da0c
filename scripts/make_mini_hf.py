"""Build the committed mini classifier artifacts (run once; output is
committed so pytest needs no network and no build step).

One artifact per reference checkpoint (cryptobert.py:6, finbert.py:5),
each ~170 KB: config.json + WordPiece vocab + random-init float32
weights at a model-specific seed, consumed by
etl_btc_spark.operators.minilm.MiniPipeline. Deterministic: re-running
this script reproduces the committed bytes
(tests/test_scoring.py::test_mini_artifact_deterministic re-asserts
the weights).
"""

from __future__ import annotations

import json
import os
import string
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_btc_spark.operators.minilm import CLS, PAD, SEP, UNK, artifact_dir

HIDDEN, HEADS, FFN, MAXLEN = 32, 2, 64, 64

#: fixed subword list so real finance-ish text tokenizes into
#: multi-char pieces, not just character fallback
SUBWORDS = [
    "the", "and", "ing", "ion", "er", "re", "in", "on", "at", "en",
    "bull", "bear", "ish", "market", "price", "coin", "bit", "crypt",
    "up", "down", "trade", "break", "out", "flat", "slide", "vol",
    "news", "fed", "rate", "buy", "sell", "hold", "risk", "gain",
    "loss", "high", "low", "open", "close", "pump", "dump",
]


def build_vocab() -> list[str]:
    chars = list(string.ascii_lowercase + string.digits + ".,!?$%-#@'\"/:;()")
    vocab = [PAD, UNK, CLS, SEP]
    seen = set(vocab)
    for tok in chars + SUBWORDS:
        for form in (tok, "##" + tok):
            if form not in seen:
                seen.add(form)
                vocab.append(form)
    return vocab


def build(model_id: str, seed: int, id2label: dict[int, str], out: str | None = None) -> str:
    out = out or artifact_dir(model_id)
    os.makedirs(out, exist_ok=True)
    vocab = build_vocab()
    v, h = len(vocab), HIDDEN
    rng = np.random.default_rng(seed)

    def mat(*shape, scale=0.02):
        return (rng.standard_normal(shape) * scale).astype(np.float32)

    weights = {
        "tok_emb": mat(v, h),
        "pos_emb": mat(MAXLEN, h),
        "ln1_g": np.ones(h, np.float32), "ln1_b": np.zeros(h, np.float32),
        "Wq": mat(h, h), "bq": np.zeros(h, np.float32),
        "Wk": mat(h, h), "bk": np.zeros(h, np.float32),
        "Wv": mat(h, h), "bv": np.zeros(h, np.float32),
        "Wo": mat(h, h), "bo": np.zeros(h, np.float32),
        "ln2_g": np.ones(h, np.float32), "ln2_b": np.zeros(h, np.float32),
        "W1": mat(h, FFN), "b1": np.zeros(FFN, np.float32),
        "W2": mat(FFN, h), "b2": np.zeros(h, np.float32),
        "lnf_g": np.ones(h, np.float32), "lnf_b": np.zeros(h, np.float32),
        # head scale 0.5 so softmax probs spread away from uniform
        "cls_W": mat(h, len(id2label), scale=0.5),
        "cls_b": np.zeros(len(id2label), np.float32),
    }
    cfg = {
        "architectures": ["MiniLMForSequenceClassification"],
        "hidden_size": h,
        "num_attention_heads": HEADS,
        "num_hidden_layers": 1,
        "intermediate_size": FFN,
        "vocab_size": v,
        "max_position_embeddings": MAXLEN,
        "num_labels": len(id2label),
        "id2label": {str(k): lab for k, lab in id2label.items()},
        "mini_seed": seed,
    }
    with open(os.path.join(out, "config.json"), "w") as f:
        json.dump(cfg, f, indent=1, sort_keys=True)
    with open(os.path.join(out, "vocab.txt"), "w") as f:
        f.write("\n".join(vocab))
    # uncompressed savez: bit-deterministic output (zlib versions vary)
    np.savez(os.path.join(out, "weights.npz"), **weights)
    return out


if __name__ == "__main__":
    # raw label sets follow each checkpoint (cryptobert.py:18-21 emits
    # Bullish/Bearish/Neutral which LABEL_REMAP normalizes; finbert
    # already emits the normalized set)
    print(build("ElKulako/cryptobert", 1, {0: "Bullish", 1: "Bearish", 2: "Neutral"}))
    print(build("yiyanghkust/finbert-tone", 2, {0: "Neutral", 1: "Positive", 2: "Negative"}))
