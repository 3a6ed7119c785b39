"""BERT/wordpiece NER plumbing (M1 BERT path, M6, M7, M8).

Semantics tested against hand-built examples transcribed from the
reference (`biobert_ner/utils_ner.py:165-291`, `predict.py:94-122,242-252`,
`ehr.py:196-249`) using the deterministic toy wordpiece tokenizer — no
model weights involved.
"""

import numpy as np
import pytest
import ray.data

from ehr_relation_extraction_ray.functions.ner import wordpiece_expand
from ehr_relation_extraction_ray.functions.wordpiece import (
    PAD_TOKEN_LABEL_ID,
    ToyWordpieceTokenizer,
    align_predictions,
    compute_token_maps,
    convert_examples_to_features,
    ner_predict_document,
)

LABELS = ["O", "B-Drug", "I-Drug", "B-Reason", "I-Reason"]


def test_toy_tokenizer_emits_wordpieces():
    tok = ToyWordpieceTokenizer(vocab=["aspirin"], max_piece=4)
    assert tok("took aspirin today") == ["took", "aspirin", "toda", "##y"]
    assert tok("Jacksonville") == ["Jack", "##sonv", "##ille"]
    # ids are content-derived: stable across instances
    assert tok.convert_tokens_to_ids(["aspirin"]) == ToyWordpieceTokenizer(
    ).convert_tokens_to_ids(["aspirin"])
    assert tok.convert_tokens_to_ids(["[CLS]", "[SEP]", "[PAD]"]) == [1, 2, 0]


def test_token_maps_bert_walk():
    """ehr.py:196-249 parity: ## skips two chars, discarded chars inherit
    the previous token's index, trailing chars inherit the last token."""
    tok = ToyWordpieceTokenizer(max_piece=4)
    text = "Jacksonville  ok "
    tokens = tok(text)  # Jack ##sonv ##ille ok
    c2t, t2c = compute_token_maps(text, tokens, is_bert=True)
    assert len(c2t) == len(text)
    assert t2c == [(0, 4), (4, 8), (8, 12), (14, 16)]
    assert c2t[:4] == [0] * 4
    assert c2t[4:8] == [1] * 4
    assert c2t[8:12] == [2] * 4
    assert c2t[12:14] == [2, 2]  # the two spaces inherit token 2
    assert c2t[14:16] == [3, 3]
    assert c2t[16] == 3  # trailing space


def test_token_maps_mismatch_raises():
    with pytest.raises(ValueError):
        compute_token_maps("abc", ["abd"], is_bert=True)


def test_convert_examples_to_features_layout():
    """utils_ner.py:165-291: [CLS] A [SEP] layout, -100 on ## pieces and
    specials/padding, right padding, truncation to max_seq - 2."""
    tok = ToyWordpieceTokenizer(max_piece=4)
    words = ["took", "aspi", "##rin", "ok"]
    labels = ["O", "B-Drug", "B-Drug", "O"]  # ## label is ignored anyway
    feats = convert_examples_to_features([(words, labels)], LABELS, 10, tok)
    ids = feats["input_ids"][0]
    assert ids[0] == 1 and ids[5] == 2  # [CLS] ... [SEP]
    assert list(feats["attention_mask"][0]) == [1] * 6 + [0] * 4
    assert list(feats["label_ids"][0]) == [
        PAD_TOKEN_LABEL_ID, 0, 1, PAD_TOKEN_LABEL_ID, 0, PAD_TOKEN_LABEL_ID,
        PAD_TOKEN_LABEL_ID, PAD_TOKEN_LABEL_ID, PAD_TOKEN_LABEL_ID,
        PAD_TOKEN_LABEL_ID,
    ]
    assert list(ids[6:]) == [0] * 4  # right-padded with pad id

    # truncation: 6 pieces with max_seq 6 -> keep 4 + specials
    many = (["w1", "w2", "w3", "w4", "w5", "w6"], ["O"] * 6)
    f2 = convert_examples_to_features([many], LABELS, 6, tok)
    assert f2["attention_mask"][0].sum() == 6
    assert f2["input_ids"][0][5] == 2  # [SEP] sits at the end


def test_align_predictions_drops_ignored_positions():
    """predict.py:94-122: argmax, keep only label_ids != -100."""
    n_labels = len(LABELS)
    logits = np.zeros((1, 5, n_labels))
    logits[0, 1, 1] = 5.0  # B-Drug
    logits[0, 2, 2] = 5.0  # I-Drug (but position ignored)
    logits[0, 3, 0] = 5.0  # O
    label_ids = np.array([[PAD_TOKEN_LABEL_ID, 0, PAD_TOKEN_LABEL_ID, 0,
                           PAD_TOKEN_LABEL_ID]])
    out = align_predictions(logits, label_ids, LABELS)
    assert out == [["B-Drug", "O"]]


def test_wordpiece_expand_parity():
    """predict.py:242-252: ## pieces inherit the head label forced to I-."""
    preds = ["B-Drug", "O"]
    tokens = ["aspi", "##rin", "ok"]
    assert wordpiece_expand(preds, tokens) == ["B-Drug", "I-Drug", "O"]
    assert wordpiece_expand(["O"], ["to", "##day"]) == ["O", "O"]


def _drug_logits_factory():
    """Oracle logits: B-Drug wherever the input id equals the 'aspirin'
    piece id, else O — a weight-free stand-in with the real signature."""
    drug_id = ToyWordpieceTokenizer().convert_tokens_to_ids(["aspirin"])[0]

    def fn(feats):
        ids = feats["input_ids"]
        logits = np.zeros((*ids.shape, len(LABELS)), dtype=np.float32)
        logits[..., 0] = 1.0
        hit = ids == drug_id
        logits[hit, 0] = 0.0
        logits[hit, 1] = 2.0
        return logits

    return fn


def test_ner_cascade_recovers_spans():
    tok = ToyWordpieceTokenizer(vocab=["aspirin"], max_piece=4)
    text = "patient took aspirin today .\nfollow up soon ."
    spans = ner_predict_document(text, tok, _drug_logits_factory(), LABELS)
    assert spans == [("Drug", 13, 20)]
    assert text[13:20] == "aspirin"


def test_ner_cascade_multi_window():
    """Multiple 126-token windows: predictions flatten across windows in
    order, so a mention in a late window still lands on its chars."""
    tok = ToyWordpieceTokenizer(vocab=["aspirin"], max_piece=4)
    line = "filler words repeat here .\n"
    text = (line * 60) + "took aspirin now .\n" + (line * 60)
    spans = ner_predict_document(text, tok, _drug_logits_factory(), LABELS)
    start = text.index("aspirin")
    assert ("Drug", start, start + 7) in spans
    assert len(spans) == 1


def test_detect_wordpiece_stage_matches_serial(ray_session):
    from ehr_relation_extraction_ray.stages import mentions as mstage

    # NOTE: everything shipped to the actor pool must be defined inside the
    # test (cloudpickle serializes nested functions by value; module-level
    # test functions pickle by REFERENCE, and Ray workers cannot import the
    # tests/ directory -> actor restart loop).
    labels = list(LABELS)

    def logits_factory():
        from ehr_relation_extraction_ray.functions.wordpiece import (
            ToyWordpieceTokenizer as T,
        )

        drug_id = T().convert_tokens_to_ids(["aspirin"])[0]

        def fn(feats):
            ids = feats["input_ids"]
            logits = np.zeros((*ids.shape, len(labels)), dtype=np.float32)
            logits[..., 0] = 1.0
            hit = ids == drug_id
            logits[hit, 0] = 0.0
            logits[hit, 1] = 2.0
            return logits

        return fn

    def tok_factory():
        from ehr_relation_extraction_ray.functions.wordpiece import (
            ToyWordpieceTokenizer as T,
        )

        return T(vocab=["aspirin"])
    texts = {
        "d1": "patient took aspirin today .",
        "d2": "no relevant mention here .",
        "d3": "aspirin early and aspirin late .",
    }
    docs = ray.data.from_items(
        [{"doc_id": k, "text": v} for k, v in texts.items()]
    )
    got = (
        mstage.detect_wordpiece(
            docs,
            logits_factory,
            labels,
            tokenizer_factory=tok_factory,
            concurrency=2,
            batch_size=1,
        )
        .to_pandas()
        .sort_values(["doc_id", "start"])
        .reset_index(drop=True)
    )
    rows = []
    for doc_id, text in texts.items():
        spans = ner_predict_document(
            text, tok_factory(), _drug_logits_factory(), LABELS
        )
        from ehr_relation_extraction_ray.functions.ner import detect_mentions

        for ent_id, ent_type, s, e, surf in detect_mentions(text, spans):
            rows.append(
                {"doc_id": doc_id, "ent_id": ent_id, "ent_type": ent_type,
                 "start": s, "end": e, "text": surf}
            )
    import pandas as pd

    want = pd.DataFrame(rows).sort_values(["doc_id", "start"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert list(got.columns) == ["doc_id", "ent_id", "ent_type", "start", "end", "text"]


def test_model_token_spans_reconstruct_text():
    """model_token_spans spans must exactly cover each token's source chars
    (M3: windowing on the model tokenizer, predict.py:31-33)."""
    from ehr_relation_extraction_ray.functions.wordpiece import (
        ToyWordpieceTokenizer,
        model_token_spans,
    )

    tok = ToyWordpieceTokenizer(vocab=["aspirin"])
    text = "patient took aspirin  today\nand felt fine ."
    starts, ends = model_token_spans(text, tok)
    pieces = tok(text)
    assert len(starts) == len(pieces)
    for p, s, e in zip(pieces, starts, ends):
        assert text[s:e].lower() == p.removeprefix("##").lower()
    # spans are non-overlapping and increasing
    assert (starts[1:] >= ends[:-1]).all()


def test_candidates_window_on_model_tokenizer(ray_session):
    """CandidateGenerator(tokenizer=...) windows on model tokens: with a
    wordpiece tokenizer every word explodes into >=1 pieces, so a small
    max_len must split earlier than the whitespace path."""
    import ray.data
    from ehr_relation_extraction_ray.stages.candidates import CandidateGenerator
    import pyarrow as pa

    text = (
        "patient took aspirin 100 mg daily for pain . "
        "later stopped aspirin due to nausea symptoms today . "
    ) * 4
    batch = pa.table({"doc_id": ["d1"], "text": [text]})
    ws = CandidateGenerator(max_len=24)(batch)
    wp = CandidateGenerator(max_len=24, tokenizer="wordpiece-toy")(batch)
    # both paths produce candidates; wordpiece path sees more tokens so it
    # cuts more windows over the same text
    assert ws.num_rows > 0 and wp.num_rows > 0
    assert wp["win_idx"].to_pandas().max() > ws["win_idx"].to_pandas().max()
    # schema identical (the tokenizer only moves window boundaries)
    assert wp.schema.equals(ws.schema)


def test_scispacy_slot_is_gated():
    from ehr_relation_extraction_ray import registry

    tok = registry.get("tokenizer", "scispacy")
    with pytest.raises(NotImplementedError):
        tok("some text")
