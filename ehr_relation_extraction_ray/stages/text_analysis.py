"""Text-analysis stage over a documents table: one streamed pass adds
language id, quality features, token counts and fingerprints.

Arrow-native hot path (VERDICT r1): counts/ratios run as pyarrow.compute
regex kernels over the zero-copy batch, language/stopword hits as one
split->flatten->is_in->bincount chain — no per-row Python regex loops.
The only per-row loops left are md5 (C-speed hashlib; no vectorized
kernel exists) and the numpy-vectorized-per-doc winnowing fingerprint.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..functions import textstats
from ..functions.textstats import LANG_MARKERS

_LANGS = list(LANG_MARKERS)
_MARKER_ARRAYS = {
    lang: pa.array(sorted(markers), pa.string())
    for lang, markers in LANG_MARKERS.items()
}


def annotate_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch[text_col]
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    texts = pc.fill_null(texts, "")
    n = len(texts)

    n_chars = pc.utf8_length(texts)
    n_tokens = pc.count_substring_regex(texts, r"\S+")
    n_punct = pc.count_substring_regex(texts, r"[^\w\s]")
    n_digit = pc.count_substring_regex(texts, r"\d")

    # words per doc, lowercased: one split -> flatten -> is_in per language
    words = pc.split_pattern_regex(pc.utf8_lower(texts), r"[^a-z']+")
    flat = pc.list_flatten(words)
    parents = np.asarray(pc.list_parent_indices(words))
    hits = np.zeros((len(_LANGS), n), dtype=np.int64)
    for li, lang in enumerate(_LANGS):
        mask = np.asarray(pc.is_in(flat, value_set=_MARKER_ARRAYS[lang]))
        if len(parents):
            hits[li] = np.bincount(parents, weights=mask, minlength=n)
    best = hits.argmax(axis=0)  # first max wins == dict-order tie rule
    lang_pred = np.where(
        hits.max(axis=0) > 0, np.asarray(_LANGS, dtype=object)[best], "und"
    )

    nc = np.asarray(n_chars, dtype=np.float64)
    nt = np.asarray(n_tokens, dtype=np.float64)
    nc1 = np.maximum(nc, 1.0)
    nt1 = np.maximum(nt, 1.0)

    py_texts = texts.to_pylist()
    out = batch
    cols = {
        "n_chars": pa.array(nc.astype(np.int64)),
        "n_tokens": pa.array(nt.astype(np.int64)),
        "punct_ratio": pa.array(np.asarray(n_punct, np.float64) / nc1),
        "digit_ratio": pa.array(np.asarray(n_digit, np.float64) / nc1),
        "stopword_ratio": pa.array(hits[_LANGS.index("en")] / nt1),
        "mean_token_len": pa.array((nc - nt1 + 1) / nt1),
        "lang_pred": pa.array(lang_pred, pa.string()),
        "bpe_tokens": pa.array(textstats.bpe_token_count(py_texts)),
        "md5": pa.array(
            [hashlib.md5(t.encode("utf-8")).hexdigest() for t in py_texts],
            pa.string(),
        ),
        "fingerprint": pa.array(
            np.array(
                [textstats.rolling_fingerprint(t) for t in py_texts],
                dtype=np.uint64,
            ).astype(np.int64)
        ),
    }
    for name, arr in cols.items():
        out = out.append_column(name, arr)
    return out


def annotate(
    docs: "ray.data.Dataset", text_col: str = "text", batch_size: int = 1024
) -> "ray.data.Dataset":
    return docs.map_batches(
        lambda t: annotate_batch(t, text_col),
        batch_format="pyarrow",
        batch_size=batch_size,
    )


# -- TF-IDF -----------------------------------------------------------------
#
# Doc-term weighting over the corpus, the workhorse of quality filtering /
# keyword extraction in training-data pipelines.  Scale shape:
#
# * (doc_id, term, tf) is FINAL per batch — each input row is one whole
#   document, so term counting never needs a cross-batch merge.
# * document frequency is pre-aggregated per batch (combiner) before the
#   one groupby(term) shuffle of (term, partial_df) pairs — never the
#   exploded token stream.
# * tf |><| df is a native hash-shuffle join on term (both sides fact-sized
#   at web scale; no broadcast assumption).
# * top-k per doc runs at hash-partition granularity (one UDF call per
#   partition, vectorized sort + groupby-head inside).


def doc_term_counts(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Explode docs to (doc_id, term, tf); whitespace tokens, lowercased."""

    def counts(batch: pa.Table) -> pa.Table:
        import pandas as pd

        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        words = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        flat = pc.list_flatten(words)
        parents = np.asarray(pc.list_parent_indices(words))
        ids = batch[id_col].cast(pa.string())
        keep = np.asarray(pc.utf8_length(flat)) > 0
        df = pd.DataFrame(
            {
                "doc_id": np.asarray(ids.take(pa.array(parents[keep]))),
                "term": np.asarray(flat)[keep],
            }
        )
        out = (
            df.groupby(["doc_id", "term"], sort=False)
            .size()
            .reset_index(name="tf")
        )
        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "term": pa.array(out["term"], pa.string()),
                "tf": pa.array(out["tf"].to_numpy(np.int64)),
            }
        )

    return docs.map_batches(counts, batch_format="pyarrow")


def tfidf_top_terms(
    docs: "ray.data.Dataset",
    k: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Top-k TF-IDF terms per doc: (doc_id, term, tf, tfidf).

    idf = ln(n_docs / df) over docs with at least one token; ties broken
    by term asc so the result is deterministic and SQL-reproducible
    (``row_number() OVER (ORDER BY tfidf DESC, term)``).
    """
    from ray.data.aggregate import Sum

    from ..functions.partitioning import groupby_partition
    from .joins import hash_join

    tf = doc_term_counts(docs, text_col, id_col).materialize()

    # n_docs: every doc is one input row, so per-batch distinct-doc counts
    # sum exactly (combiner; no global distinct shuffle)
    nd = tf.map_batches(
        lambda t: pa.table(
            {"n": pa.array([len(pc.unique(t["doc_id"]))], pa.int64())}
        ),
        batch_format="pyarrow",
    ).aggregate(Sum("n"))["sum(n)"]

    # df: per-batch partial (term, docs-in-batch) counts, then one shuffle
    partial_df = tf.map_batches(
        lambda t: pa.TableGroupBy(
            pa.table({"term": t["term"]}), "term"
        ).aggregate([([], "count_all")]).rename_columns(["term", "pdf"]),
        batch_format="pyarrow",
    )

    def sum_df(part: pa.Table) -> pa.Table:
        agg = pa.TableGroupBy(part, "term").aggregate([("pdf", "sum")])
        return agg.rename_columns(["term", "df"])

    df_tbl = groupby_partition(
        partial_df,
        "term",
        sum_df,
        num_partitions=num_partitions,
        schema=pa.schema([("term", pa.string()), ("df", pa.int64())]),
    )

    joined = hash_join(tf, df_tbl, on="term", num_partitions=num_partitions)

    def score(t: pa.Table) -> pa.Table:
        tfv = np.asarray(t["tf"], np.float64)
        dfv = np.asarray(t["df"], np.float64)
        tfidf = np.round(tfv * np.log(float(nd) / dfv), 6)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "term": t["term"],
                "tf": t["tf"],
                "tfidf": pa.array(tfidf),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")

    def topk(part) -> "pa.Table":
        part = part.sort_values(
            ["doc_id", "tfidf", "term"], ascending=[True, False, True]
        )
        return pa.Table.from_pandas(
            part.groupby("doc_id", sort=False).head(k),
            preserve_index=False,
        )

    return groupby_partition(
        scored,
        "doc_id",
        topk,
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=pa.schema(
            [
                ("doc_id", pa.string()),
                ("term", pa.string()),
                ("tf", pa.int64()),
                ("tfidf", pa.float64()),
            ]
        ),
    )


def inverted_index(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_partitions: int = 64,
    max_postings: int | None = None,
) -> "ray.data.Dataset":
    """(term, df, postings) — sorted doc-id posting list per term.

    Scale shape: the (doc_id, term) pairs are distinct per batch already
    (each input row is one whole doc), so the only shuffle is the
    groupby(term); postings materialize per PARTITION, never on the
    driver.  ``max_postings`` truncates stop-word-grade lists to the
    first N doc ids (df stays exact) and, when it truncates anything,
    logs the count — no silent caps.
    """
    import logging

    tf = doc_term_counts(docs, text_col, id_col)

    def build(part) -> pa.Table:
        part = part.sort_values(["term", "doc_id"])
        g = part.groupby("term", sort=True)
        terms = []
        dfs = []
        postings = []
        n_truncated = 0
        for term, grp in g:
            ids = grp["doc_id"].tolist()
            dfs.append(len(ids))
            if max_postings is not None and len(ids) > max_postings:
                ids = ids[:max_postings]
                n_truncated += 1
            terms.append(term)
            postings.append(ids)
        if n_truncated:
            logging.getLogger(__name__).warning(
                "inverted_index: %d posting lists truncated to %d ids",
                n_truncated,
                max_postings,
            )
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "df": pa.array(dfs, pa.int64()),
                "postings": pa.array(postings, pa.list_(pa.string())),
            }
        )

    from ..functions.partitioning import groupby_partition

    return groupby_partition(
        tf.select_columns([id_col, "term"]),
        "term",
        build,
        num_partitions=num_partitions,
        batch_format="pandas",
        schema=pa.schema(
            [
                ("term", pa.string()),
                ("df", pa.int64()),
                ("postings", pa.list_(pa.string())),
            ]
        ),
    )


def corpus_term_freq(
    docs: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """Global unigram frequencies (term, c). Combiner shape: each batch
    pre-sums its own term counts (one row per distinct term per block),
    then ONE groupby(term).sum of the partials — a hot term ("the") moves
    at most one row per block through the shuffle, never per occurrence."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        words = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        flat = pc.list_flatten(words)
        keep = np.asarray(pc.utf8_length(flat)) > 0
        s = pd.Series(np.asarray(flat)[keep])
        vc = s.value_counts(sort=False)
        return pa.table(
            {
                "term": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "c": pa.array(vc.to_numpy(np.int64)),
            }
        )

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("c", alias_name="c"))
    )


def unigram_logprob(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Per-document mean unigram log-probability under a unigram LM fit on
    the corpus itself (CCNet-style LM quality filter, here with the
    simplest possible LM so the score is SQL-checkable).

    Scale shape: the LM is the corpus term-frequency table — vocabulary-
    sized, built with the combiner groupby above, collected once and
    broadcast as a term->logprob dict (``ray.put``); the scoring pass is a
    stateless zero-shuffle ``map_batches``. Returns
    (doc_id, n_tokens, avg_logprob) for docs with >= 1 token.
    """
    import pandas as pd

    freq = corpus_term_freq(docs, text_col=text_col).to_pandas()
    total = float(freq["c"].sum())
    logp = dict(
        zip(freq["term"], np.log(freq["c"].to_numpy(np.float64) / total))
    )
    lm_ref = ray.put(logp)

    def score(batch: pa.Table) -> pa.Table:
        from ..functions.broadcast import bget

        lm = bget(lm_ref)
        ids, ns, avgs = [], [], []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = (text or "").lower().split()
            if not toks:
                continue
            s = np.fromiter((lm[t] for t in toks), dtype=np.float64, count=len(toks))
            ids.append(doc_id)
            ns.append(len(toks))
            avgs.append(float(s.mean()))
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "n_tokens": pa.array(ns, pa.int64()),
                "avg_logprob": pa.array(avgs, pa.float64()),
            }
        )

    return docs.map_batches(score, batch_format="pyarrow")


def repetition_signals(
    docs: "ray.data.Dataset",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Gopher-style intra-document repetition filters (Rae et al. 2021,
    table A1): duplicate-line fraction and most-frequent-word-bigram
    fraction. Pure per-doc signals -> ONE stateless zero-shuffle
    ``map_batches``; at 100 TB cost is a single streamed read.

    Returns (doc_id, n_lines, dup_line_frac, top_bigram_frac) for docs
    with non-whitespace text; docs with < 2 words score 0 bigram frac.
    """
    from collections import Counter

    def sig(batch: pa.Table) -> pa.Table:
        ids, n_lines_l, dup_l, top_l = [], [], [], []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            text = text or ""
            if not text.strip():
                continue
            lines = [l for l in text.split("\n") if l.strip()]
            n_lines = len(lines)
            dup = 1.0 - len(set(lines)) / n_lines
            words = text.lower().split()
            if len(words) >= 2:
                c = Counter(zip(words, words[1:]))
                top = max(c.values()) / (len(words) - 1)
            else:
                top = 0.0
            ids.append(doc_id)
            n_lines_l.append(n_lines)
            dup_l.append(dup)
            top_l.append(top)
        return pa.table(
            {
                id_col: pa.array(ids, batch[id_col].type),
                "n_lines": pa.array(n_lines_l, pa.int64()),
                "dup_line_frac": pa.array(dup_l, pa.float64()),
                "top_bigram_frac": pa.array(top_l, pa.float64()),
            }
        )

    return docs.map_batches(sig, batch_format="pyarrow")


def heavy_hitter_terms(
    docs: "ray.data.Dataset",
    k: int = 10,
    capacity: int = 256,
    text_col: str = "text",
) -> "pd.DataFrame":
    """EXACT global top-k terms in bounded memory — the two-pass
    heavy-hitters pattern for vocabularies too large to shuffle:

    1. each block folds its tokens into a Misra-Gries summary of
       ``capacity`` entries (functions/sketch) — the driver merge sees
       ``capacity x blocks`` rows, never the vocabulary;
    2. the merged summary's top ``2k`` terms become the candidate set
       (MG guarantees every term with count > n/capacity survives, so
       for k << capacity the true top-k are all candidates);
    3. a second zero-shuffle pass counts ONLY the broadcast candidates
       exactly; final order is (count desc, term).

    Returns a pandas DataFrame (term, c) of k rows with EXACT counts.
    """
    import pandas as pd

    from ..functions.broadcast import bget
    from ..functions.sketch import misra_gries, misra_gries_merge

    def block_summary(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        words = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        flat = pc.list_flatten(words)
        keep = np.asarray(pc.utf8_length(flat)) > 0
        s = pd.Series(np.asarray(flat)[keep])
        mg = misra_gries(s.value_counts(sort=False).to_dict(), capacity)
        return pa.table(
            {
                "term": pa.array(list(mg.keys()), pa.string()),
                "c": pa.array(np.fromiter(mg.values(), dtype=np.int64)),
            }
        )

    partials = docs.map_batches(block_summary, batch_format="pyarrow").to_pandas()
    # one-shot merge of all block summaries: summing duplicate terms first
    # IS misra_gries_merge over the per-block dicts (addition commutes)
    merged = misra_gries(
        partials.groupby("term")["c"].sum().to_dict(), capacity
    )
    cands = sorted(merged, key=lambda t: (-merged[t], t))[: 2 * k]
    cand_ref = ray.put(frozenset(cands))

    def exact_counts(batch: pa.Table) -> pa.Table:
        cset = bget(cand_ref)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        words = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        flat = np.asarray(pc.list_flatten(words))
        s = pd.Series(flat)
        vc = s[s.isin(cset)].value_counts(sort=False)
        return pa.table(
            {
                "term": pa.array(vc.index.to_numpy(dtype=object), pa.string()),
                "c": pa.array(vc.to_numpy(np.int64)),
            }
        )

    exact = docs.map_batches(exact_counts, batch_format="pyarrow").to_pandas()
    out = exact.groupby("term", as_index=False)["c"].sum()
    out = out.sort_values(["c", "term"], ascending=[False, True], kind="stable")
    return out.head(k).reset_index(drop=True)


def normalize_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """LM-pretraining text normalization, pure Arrow kernels (zero-copy,
    no Python per row): lowercase, digits -> '0', whitespace runs -> one
    space, trim. Both pyarrow and DuckDB compile regexes with RE2, so the
    oracle (`regexp_replace(..., 'g')`) is dialect-identical. Emits the
    digit count alongside so the scrub is auditable (no silent edits)."""
    text = batch[text_col]
    n_digits = pc.count_substring_regex(text, r"\d")
    norm = pc.utf8_lower(text)
    norm = pc.replace_substring_regex(norm, r"\d", "0")
    norm = pc.replace_substring_regex(norm, r"\s+", " ")
    norm = pc.utf8_trim_whitespace(norm)
    return batch.append_column("n_digits", pc.cast(n_digits, pa.int64())) \
                .append_column("norm_text", norm)


def normalize(
    ds: "ray.data.Dataset", text_col: str = "text"
) -> "ray.data.Dataset":
    """Streamed normalization pass — one map_batches, no shuffle."""
    return ds.map_batches(
        lambda b: normalize_batch(b, text_col), batch_format="pyarrow"
    )


def lang_term_freq(
    docs: "ray.data.Dataset", text_col: str = "text", lang_col: str = "lang"
) -> "ray.data.Dataset":
    """Per-language unigram frequencies (lang, term, c) — the keyed
    variant of :func:`corpus_term_freq`, same combiner shape: one row per
    distinct (lang, term) per block, then one groupby of partials."""
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        words = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        flat = pc.list_flatten(words)
        lens = np.asarray(pc.list_value_length(words))
        langs = np.repeat(np.asarray(batch[lang_col], dtype=object), lens)
        keep = np.asarray(pc.utf8_length(flat)) > 0
        df = pd.DataFrame({"lang": langs[keep], "term": np.asarray(flat)[keep]})
        vc = df.groupby(["lang", "term"], sort=False).size().rename("c")
        return pa.Table.from_pandas(vc.reset_index())

    return (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby(["lang", "term"])
        .aggregate(Sum("c", alias_name="c"))
    )


def lang_divergence(docs: "ray.data.Dataset") -> "pd.DataFrame":
    """Jensen-Shannon divergence of each language's unigram distribution
    vs the REST of the corpus (domain-shift / mixture diagnostics).

    The (lang x vocab) count table from :func:`lang_term_freq` is
    vocab-bounded (never corpus-sized); the JSD itself is a vectorized
    numpy pivot on the driver, exactly like the unigram-LM and k-means
    finishing steps."""
    import pandas as pd

    lt = lang_term_freq(docs).to_pandas()
    pivot = lt.pivot_table(
        index="term", columns="lang", values="c", aggfunc="sum", fill_value=0
    ).astype(np.float64)
    totals = pivot.sum(axis=0)
    grand = totals.sum()
    if len(pivot.columns) < 2:
        raise ValueError(
            "lang_divergence needs >= 2 languages (JSD vs an empty "
            f"rest-of-corpus is undefined); got {list(pivot.columns)}"
        )
    ct = pivot.sum(axis=1).to_numpy()  # loop-invariant row totals
    rows = []
    for lang in sorted(pivot.columns):
        cl = pivot[lang].to_numpy()
        p = cl / totals[lang]
        q = (ct - cl) / (grand - totals[lang])
        m = (p + q) / 2.0
        with np.errstate(divide="ignore", invalid="ignore"):
            kl_p = np.where(p > 0, p * np.log(p / m), 0.0)
            kl_q = np.where(q > 0, q * np.log(q / m), 0.0)
        rows.append(
            {
                "lang": lang,
                "n_tokens": int(totals[lang]),
                "jsd": round(float(0.5 * kl_p.sum() + 0.5 * kl_q.sum()), 6),
            }
        )
    return pd.DataFrame(rows, columns=["lang", "n_tokens", "jsd"])


def boilerplate_ngrams(
    docs: "ray.data.Dataset",
    min_docs: int = 3,
    k: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "ray.data.Dataset":
    """Repeated-n-gram boilerplate detection (Lee et al. dedup recipe):
    word k-grams occurring in >= ``min_docs`` DISTINCT documents — the
    removal unit for templated/boilerplate spans that survive doc-level
    dedup.

    Combiner shape: each block emits (ngram, distinct-doc-count) partials
    — exact because every document is one input row, so a block never
    splits a doc — then ONE groupby(ngram) of partials. This variant
    carries the n-gram STRINGS (exact-oracle mirror); the hashed
    decontamination machinery (stages/dedupe) is the 100 TB path where
    strings would dominate the shuffle.
    """
    import pandas as pd

    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        grams, ids = [], []
        for doc_id, text in zip(
            batch[id_col].to_pylist(), batch[text_col].to_pylist()
        ):
            toks = (text or "").lower().split()
            if not toks:
                continue
            if len(toks) < k:
                sh = {" ".join(toks)}
            else:
                sh = {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}
            grams.extend(sh)
            ids.extend([doc_id] * len(sh))
        df = pd.DataFrame({"ngram": grams, "doc": ids})
        per = df.groupby("ngram", sort=False).size().rename("df")
        out = per.reset_index()
        return pa.table(
            {
                "ngram": pa.array(out["ngram"], pa.string()),
                "df": pa.array(out["df"].to_numpy(np.int64)),
            }
        )

    counted = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("ngram")
        .aggregate(Sum("df", alias_name="df"))
    )
    return counted.filter(expr=f"df >= {int(min_docs)}")


def bpe_merges(
    docs: "ray.data.Dataset",
    n_merges: int = 12,
    min_count: int = 1,
    text_col: str = "text",
) -> "pd.DataFrame":
    """Learn the first ``n_merges`` byte-pair-encoding merges (Sennrich
    et al. 2016) from the corpus — the tokenizer-training step of a
    training-data pipeline.

    Scale shape: the distributed work is the corpus word-frequency count
    (:func:`corpus_term_freq` — per-block combiner, one groupby of
    partials; a hot word moves one row per block). The merge loop then
    runs on the driver over the word-frequency DICTIONARY — vocabulary-
    sized, never corpus-sized — which is exactly how reference BPE
    trainers operate on any corpus size; ``min_count`` prunes the
    long-tail vocabulary at scale (document the cutoff, don't silently
    cap). Tiebreak on equal pair counts is lexicographic, so the result
    is deterministic and block-structure-invariant.

    Returns (rank, left, right, pair_count), rank = merge order.
    """
    import pandas as pd

    wf = corpus_term_freq(docs, text_col=text_col).to_pandas()
    wf = wf[wf["c"] >= min_count]
    vocab = dict(zip(wf["term"], wf["c"].astype(int)))
    # symbol sequences: characters + an explicit end-of-word marker
    words = {w: [*w, "</w>"] for w in vocab}

    # incremental pair bookkeeping (the standard BPE-trainer structure):
    # a merge touches ONLY the words containing the merged pair, so each
    # iteration costs O(affected words x word length), not O(vocab) — the
    # difference between minutes and hours at a web-corpus vocabulary.
    pair_counts: dict = {}
    pair_words: dict = {}
    for w, syms in words.items():
        n = vocab[w]
        for p in zip(syms, syms[1:]):
            pair_counts[p] = pair_counts.get(p, 0) + n
            pair_words.setdefault(p, set()).add(w)

    out = []
    for rank in range(n_merges):
        if not pair_counts:
            break
        (la, lb), cnt = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        out.append((rank, la, lb, cnt))
        merged = la + lb
        for w in sorted(pair_words.get((la, lb), ())):
            syms, n = words[w], vocab[w]
            # retract this word's current pair contributions ...
            for p in zip(syms, syms[1:]):
                left = pair_counts[p] - n
                if left:
                    pair_counts[p] = left
                else:
                    del pair_counts[p]
            ns, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == la and syms[i + 1] == lb:
                    ns.append(merged)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            words[w] = ns
            # ... and re-add them post-merge (pair_words may keep stale
            # entries; retract+re-add makes visiting one a no-op)
            for p in zip(ns, ns[1:]):
                pair_counts[p] = pair_counts.get(p, 0) + n
                pair_words.setdefault(p, set()).add(w)
        pair_words.pop((la, lb), None)
        pair_counts.pop((la, lb), None)
    return pd.DataFrame(
        out, columns=["rank", "left", "right", "pair_count"]
    ).astype({"rank": "int64", "pair_count": "int64"})


def bm25_topk(
    docs: "ray.data.Dataset",
    query_terms,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "pd.DataFrame":
    """Distributed BM25 retrieval (Robertson & Zaragoza 2009, the public
    Okapi formula) — top-k documents for a fixed term query.

    Scale shape (two streamed passes, zero shuffles):

    1. corpus-statistics pass: each block emits ONE partial row
       (n_docs, sum_dl, df per query term) — the driver merge is
       blocks x O(|query|), never corpus-sized;
    2. scoring pass with the broadcast idf/avgdl constants: each block
       emits its local top-k ordered by the FINAL composite key
       (score rounded to 6 dp desc, doc_id asc — the rounding happens
       BEFORE selection so block-local ties resolve exactly like the
       global order), so the union of blocks x k partials provably
       contains the global top-k.

    Tokenization matches the repo-wide oracle dialect:
    split-on-whitespace of the lowercased text, empty tokens dropped.

    Returns a pandas DataFrame (doc_id, score) of k rows.
    """
    import pandas as pd

    from ..functions.broadcast import bget

    terms = list(dict.fromkeys(query_terms))
    m = len(terms)
    term_arrays = [pa.array([t], pa.string()) for t in terms]

    def _tf_dl(batch: pa.Table):
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        n = len(texts)
        words = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        flat = pc.list_flatten(words)
        parents = np.asarray(pc.list_parent_indices(words))
        nonempty = np.asarray(pc.utf8_length(flat)) > 0
        dl = (
            np.bincount(parents, weights=nonempty, minlength=n).astype(np.int64)
            if len(parents)
            else np.zeros(n, dtype=np.int64)
        )
        tf = np.zeros((m, n), dtype=np.int64)
        for ti in range(m):
            hit = np.asarray(pc.is_in(flat, value_set=term_arrays[ti]))
            if len(parents):
                tf[ti] = np.bincount(parents, weights=hit, minlength=n)
        return dl, tf

    def stats_partial(batch: pa.Table) -> pa.Table:
        dl, tf = _tf_dl(batch)
        cols = {
            "n_docs": pa.array([len(dl)], pa.int64()),
            "sum_dl": pa.array([int(dl.sum())], pa.int64()),
        }
        for ti in range(m):
            cols[f"df_{ti}"] = pa.array([int((tf[ti] > 0).sum())], pa.int64())
        return pa.table(cols)

    stats = (
        docs.map_batches(stats_partial, batch_format="pyarrow")
        .to_pandas()
        .sum()
    )
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["sum_dl"]) / max(n_docs, 1)
    idf = np.array(
        [
            np.log((n_docs - stats[f"df_{ti}"] + 0.5) / (stats[f"df_{ti}"] + 0.5) + 1.0)
            for ti in range(m)
        ]
    )
    const_ref = ray.put((idf, avgdl))

    def score_partial(batch: pa.Table) -> pa.Table:
        idf_, avgdl_ = bget(const_ref)
        dl, tf = _tf_dl(batch)
        doc_ids = np.asarray(batch[id_col].combine_chunks()
                             if isinstance(batch[id_col], pa.ChunkedArray)
                             else batch[id_col])
        norm = k1 * (1.0 - b + b * dl / max(avgdl_, 1e-12))
        score = np.zeros(len(dl), dtype=np.float64)
        for ti in range(m):
            t = tf[ti].astype(np.float64)
            score += idf_[ti] * t * (k1 + 1.0) / np.maximum(t + norm, 1e-12)
        keep = tf.sum(axis=0) > 0
        score = np.round(score[keep], 6)
        doc_ids = doc_ids[keep]
        order = np.lexsort((doc_ids, -score))[:k]
        return pa.table(
            {
                id_col: pa.array(doc_ids[order], pa.int64()),
                "score": pa.array(score[order], pa.float64()),
            }
        )

    parts = docs.map_batches(score_partial, batch_format="pyarrow").to_pandas()
    if parts.empty:
        return pd.DataFrame(
            {id_col: pd.Series([], dtype="int64"),
             "score": pd.Series([], dtype="float64")}
        )
    order = np.lexsort((parts[id_col].to_numpy(), -parts["score"].to_numpy()))[:k]
    return parts.iloc[order].reset_index(drop=True)


def bpe_apply_word(word: str, rank: dict) -> int:
    """GPT-2-style greedy BPE encode of ONE word (chars + '</w>'): merge
    the lowest-rank adjacent pair until none applies; returns the final
    symbol count. Shared by the distributed encoder and the serial
    oracle so both sides apply the identical deterministic spec."""
    syms = [*word, "</w>"]
    while len(syms) > 1:
        best, best_r = None, None
        for p in zip(syms, syms[1:]):
            r = rank.get(p)
            if r is not None and (best_r is None or r < best_r):
                best, best_r = p, r
        if best is None:
            break
        la, lb = best
        ns, i = [], 0
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == la and syms[i + 1] == lb:
                ns.append(la + lb)
                i += 2
            else:
                ns.append(syms[i])
                i += 1
        syms = ns
    return len(syms)


def bpe_encode(
    docs: "ray.data.Dataset",
    merges: "pd.DataFrame",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> "pd.DataFrame":
    """Apply a trained BPE merge table to the corpus — the tokenizer-
    APPLICATION step of a training-data pipeline (token counting for
    budget/packing decisions runs this over every document).

    Scale shape: the merge table (rank, left, right) is tokenizer-sized
    and broadcast ONCE via ``ray.put``; one zero-shuffle ``map_batches``
    pass encodes each block, memoizing per DISTINCT word within the
    batch (vocabulary-bounded work per block — a hot word is encoded
    once per block, not per occurrence). Returns per-doc
    (doc_id, n_words, n_tokens), n_tokens = total BPE symbols including
    the end-of-word markers.
    """
    import pandas as pd

    rank = {
        (str(l), str(r)): int(k)
        for k, l, r in zip(merges["rank"], merges["left"], merges["right"])
    }
    rank_ref = ray.put(rank)

    def encode(batch: pa.Table) -> pa.Table:
        import pandas as pd

        rk = ray.get(rank_ref)
        texts = batch[text_col]
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        texts = pc.fill_null(texts, "")
        words = pc.split_pattern_regex(pc.utf8_lower(texts), r"\s+")
        cache: dict = {}
        n_words = np.zeros(len(batch), dtype=np.int64)
        n_tokens = np.zeros(len(batch), dtype=np.int64)
        for i, wl in enumerate(words.to_pylist()):
            tot = 0
            nw = 0
            for w in wl:
                if not w:
                    continue
                nw += 1
                t = cache.get(w)
                if t is None:
                    t = bpe_apply_word(w, rk)
                    cache[w] = t
                tot += t
            n_words[i] = nw
            n_tokens[i] = tot
        return pa.table(
            {
                id_col: batch[id_col],
                "n_words": pa.array(n_words),
                "n_tokens": pa.array(n_tokens),
            }
        )

    out = docs.map_batches(encode, batch_format="pyarrow").to_pandas()
    out["n_words"] = out["n_words"].astype("int64")
    out["n_tokens"] = out["n_tokens"].astype("int64")
    return out.sort_values(id_col).reset_index(drop=True)
