"""Text-analysis stage over a documents table: one streamed pass adds
language id, quality features, token counts and fingerprints."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data

from ..functions import textstats


def annotate_batch(df: pd.DataFrame, text_col: str = "text") -> pd.DataFrame:
    texts = df[text_col].fillna("")
    feats = textstats.quality_features(texts)
    out = df.copy()
    for col in feats.columns:
        out[col] = feats[col].to_numpy()
    out["lang_pred"] = textstats.lang_id(texts.tolist())
    out["bpe_tokens"] = textstats.bpe_token_count(texts.tolist())
    out["md5"] = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    out["fingerprint"] = np.array(
        [textstats.rolling_fingerprint(t) for t in texts], dtype=np.uint64
    ).astype(np.int64)
    return out


def annotate(
    docs: "ray.data.Dataset", text_col: str = "text", batch_size: int = 1024
) -> "ray.data.Dataset":
    return docs.map_batches(
        lambda df: annotate_batch(df, text_col),
        batch_format="pandas",
        batch_size=batch_size,
    )
