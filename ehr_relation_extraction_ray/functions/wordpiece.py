"""BERT/wordpiece NER plumbing (SURVEY.md M1 BERT path, M6, M7).

The reference's BioBERT NER cascade (``predict.py:188-261``) is:

    tokenize with the MODEL tokenizer -> char<->token maps with ``##``
    handling (``ehr.py:196-249``) -> split points over model tokens ->
    convert_examples_to_features (``biobert_ner/utils_ner.py:165-291``) ->
    model logits -> align_predictions (``predict.py:94-122``) -> flatten ->
    ``##`` re-expansion (``predict.py:242-252``, functions/ner.py
    ``wordpiece_expand``) -> IOB decode (``get_chunks``) -> char spans.

Everything here is model-weight-free: the feature conversion, alignment
and maps are exact semantic transcriptions testable with the deterministic
:class:`ToyWordpieceTokenizer`; the real BioBERT model plugs in as a
``logits_fn`` loaded once per actor (see stages/mentions.py
``WordpieceNERDetector``).

The tokenizer interface is ``str -> List[str]`` plus the special-token
attributes used below — the scispacy slot (SURVEY.md M3/A5) is the same
interface with ``is_bert=False`` (the double-space quirk at ehr.py:220-223
is kept for that path).
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

PAD_TOKEN_LABEL_ID = -100  # nn.CrossEntropyLoss().ignore_index


class ToyWordpieceTokenizer:
    """Deterministic greedy-longest-match wordpiece tokenizer (no weights).

    Splits on whitespace, then greedily matches the longest vocab piece
    (continuations carry the ``##`` prefix, BERT convention). Unknown
    characters become single-char pieces (never ``[UNK]`` — the char map
    walk of ehr.py:196-249 requires every token to spell its source text).
    Lowercases pieces for vocab lookup but emits source-cased text only
    through the char maps (the walk compares ``.lower()`` on both sides,
    ehr.py:215,231).
    """

    cls_token = "[CLS]"
    sep_token = "[SEP]"
    pad_token = "[PAD]"
    padding_side = "right"
    pad_token_id = 0
    pad_token_type_id = 0
    model_input_names = ("input_ids", "token_type_ids", "attention_mask")

    def __init__(self, vocab: Optional[Sequence[str]] = None, max_piece: int = 4):
        # default vocab: nothing — pure max_piece-char chunking, which is
        # fully deterministic and exercises every ## path
        self.vocab_pieces = sorted(set(vocab or []), key=len, reverse=True)
        self.max_piece = max_piece
        self._specials: Dict[str, int] = {
            self.pad_token: 0,
            self.cls_token: 1,
            self.sep_token: 2,
        }

    def _split_word(self, word: str) -> List[str]:
        pieces = []
        i = 0
        lw = word.lower()
        while i < len(word):
            matched = None
            for p in self.vocab_pieces:
                if lw.startswith(p, i):
                    matched = word[i : i + len(p)]
                    break
            if matched is None:
                matched = word[i : i + self.max_piece]
            pieces.append(matched if i == 0 else "##" + matched)
            i += len(matched)
        return pieces

    def __call__(self, text: str) -> List[str]:
        out: List[str] = []
        for word in text.split():
            out.extend(self._split_word(word))
        return out

    def num_special_tokens_to_add(self) -> int:
        return 2  # [CLS] ... [SEP]

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        """Content-derived ids (crc32): deterministic across processes and
        actors — a lazily grown id dict would assign ids in document order,
        breaking parallelism invariance."""
        import zlib

        return [
            self._specials.get(t, 3 + (zlib.crc32(t.encode("utf-8")) % 999_983))
            for t in tokens
        ]


def model_token_spans(
    text: str, tokenizer: Callable[[str], List[str]], is_bert: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """(starts, ends) char spans of MODEL-tokenizer tokens (end exclusive).

    The reference windows documents on the model tokenizer, not on
    whitespace words (``predict.py:31-33``, ``generate_data.py:74-86``):
    split points are computed over the tokens the model will actually see,
    so no window exceeds the model's sequence budget after wordpiece
    explosion. These spans slot directly into ``chunking.split_points`` /
    ``char_windows`` in place of ``tokenize.token_spans`` — the chunker is
    span-driven and tokenizer-agnostic (SURVEY.md M3).

    ``is_bert=False`` selects the scispacy walk quirks of
    :func:`compute_token_maps` (no ``##`` skip, double-space drop).
    """
    tokens = tokenizer(text)
    if not tokens:
        empty = np.empty(0, dtype=np.int64)
        return empty, empty
    _, tok2char = compute_token_maps(text, tokens, is_bert=is_bert)
    arr = np.asarray(tok2char, dtype=np.int64)
    return np.ascontiguousarray(arr[:, 0]), np.ascontiguousarray(arr[:, 1])


def compute_token_maps(
    text: str, tokens: List[str], is_bert: bool = True
) -> Tuple[List[int], List[Tuple[int, int]]]:
    """char->token and token->char maps (``_compute_tokens``, ehr.py:196-249).

    Literal transcription of the reference walk, kept per-doc (the cost is
    dwarfed by model inference on this path): ``##`` prefixes skip two
    chars of the token (ehr.py:211-212), discarded chars inherit the
    previous token's index (ehr.py:214-217), the scispacy double-space
    quirk drops one space (ehr.py:220-223), mismatches raise (ehr.py:232-234
    — callers quarantine, state/quarantine.py).
    """
    char_to_token: List[int] = []
    token_to_char: List[Tuple[int, int]] = []
    j = 0
    for i, token in enumerate(tokens):
        k = 2 if (is_bert and token.startswith("##")) else 0
        while text[j].lower() != token[k].lower():
            char_to_token.append(char_to_token[-1] if char_to_token else 0)
            j += 1
        if not is_bert and text[j] == " " and j + 1 < len(text) and text[j + 1] == " ":
            char_to_token.append(char_to_token[-1] if char_to_token else 0)
            j += 1
        start = j
        while k < len(token):
            if text[j].lower() == token[k].lower():
                char_to_token.append(i)
                j += 1
                k += 1
            else:
                raise ValueError(
                    f"token/char walk mismatch at char {j} token {i} ({token!r})"
                )
        token_to_char.append((start, j))
    while j < len(text):
        char_to_token.append(char_to_token[-1] if char_to_token else 0)
        j += 1
    return char_to_token, token_to_char


def convert_examples_to_features(
    examples: List[Tuple[List[str], List[str]]],
    label_list: List[str],
    max_seq_length: int,
    tokenizer,
    pad_token_label_id: int = PAD_TOKEN_LABEL_ID,
) -> Dict[str, np.ndarray]:
    """``convert_examples_to_features`` (utils_ner.py:165-291), BERT layout.

    ``examples`` are (wordpiece tokens, word-level labels repeated onto
    pieces) pairs; ``##`` pieces get ``pad_token_label_id`` so the loss /
    alignment ignores them (utils_ner.py:196-201). Emits the [CLS] x [SEP]
    single-sequence layout with right padding (the reference's BERT branch:
    cls_token_at_end=False, pad_on_left=False, sep_token_extra=False) as
    stacked numpy arrays ready for a batched model call.
    """
    label_map = {label: i for i, label in enumerate(label_list)}
    n = len(examples)
    input_ids = np.full((n, max_seq_length), tokenizer.pad_token_id, np.int64)
    attention_mask = np.zeros((n, max_seq_length), np.int64)
    token_type_ids = np.full(
        (n, max_seq_length), tokenizer.pad_token_type_id, np.int64
    )
    label_ids = np.full((n, max_seq_length), pad_token_label_id, np.int64)

    keep = max_seq_length - tokenizer.num_special_tokens_to_add()
    for ex, (words, labels) in enumerate(examples):
        toks: List[str] = []
        lids: List[int] = []
        for word, label in zip(words, labels):
            toks.append(word)
            if word.startswith("##"):
                lids.append(pad_token_label_id)
            else:
                lids.append(label_map[label])
        if len(toks) > keep:
            toks = toks[:keep]
            lids = lids[:keep]
        toks = [tokenizer.cls_token] + toks + [tokenizer.sep_token]
        lids = [pad_token_label_id] + lids + [pad_token_label_id]
        ids = tokenizer.convert_tokens_to_ids(toks)
        input_ids[ex, : len(ids)] = ids
        attention_mask[ex, : len(ids)] = 1
        token_type_ids[ex, : len(ids)] = 0
        label_ids[ex, : len(lids)] = lids
    return {
        "input_ids": input_ids,
        "attention_mask": attention_mask,
        "token_type_ids": token_type_ids,
        "label_ids": label_ids,
    }


def align_predictions(
    predictions: np.ndarray,
    label_ids: np.ndarray,
    label_list: List[str],
    pad_token_label_id: int = PAD_TOKEN_LABEL_ID,
) -> List[List[str]]:
    """``align_predictions`` (predict.py:94-122): argmax over the label
    axis, keep only positions whose label id is not the ignore index
    (specials, padding, ``##`` pieces) — one label per head wordpiece."""
    preds = np.argmax(predictions, axis=2)
    out: List[List[str]] = []
    for i in range(preds.shape[0]):
        keep = label_ids[i] != pad_token_label_id
        out.append([label_list[p] for p in preds[i][keep]])
    return out


LogitsFn = Callable[[Dict[str, np.ndarray]], np.ndarray]


def ner_predict_document(
    text: str,
    tokenizer,
    logits_fn: LogitsFn,
    label_list: List[str],
    max_seq_length: int = 128,
    is_bert: bool = True,
) -> List[Tuple[str, int, int]]:
    """One document through the full BioBERT NER cascade
    (``get_biobert_ner_predictions``, predict.py:188-261): model-tokenizer
    windowing (split points over MODEL tokens — the reference windows on
    the model tokenizer, predict.py:203-204, NOT whitespace tokens),
    feature conversion, logits, alignment, flatten, ``##`` re-expansion,
    IOB decode, char spans. Returns raw (ent_type, start_char, end_char)
    spans in document order.
    """
    from .chunking import split_points
    from .ner import get_chunks, wordpiece_expand

    tokens = tokenizer(text)
    if not tokens:
        return []
    char_to_token, token_to_char = compute_token_maps(text, tokens, is_bert)
    starts = np.asarray([s for s, _ in token_to_char], dtype=np.int64)
    split = split_points(text, starts, max_len=max_seq_length - 2)

    examples = []
    for a, b in zip(split[:-1], split[1:]):
        words = tokens[a:b]
        if words:
            examples.append((words, ["O"] * len(words)))
    if not examples:
        return []
    feats = convert_examples_to_features(
        examples, label_list, max_seq_length, tokenizer
    )
    logits = logits_fn(feats)
    aligned = align_predictions(logits, feats["label_ids"], label_list)
    flat = [p for ex in aligned for p in ex]
    expanded = wordpiece_expand(flat, tokens)
    spans = []
    for ent_type, tok_a, tok_b in get_chunks(expanded):
        # chunk bounds follow the reference quirk (get_chunks end index);
        # char span = start of first token .. end of end-index token
        # (predict.py:255-258: get_char_idx(ent[1])[0], get_char_idx(ent[2])[1])
        end_tok = min(tok_b, len(token_to_char) - 1)
        spans.append(
            (ent_type, token_to_char[tok_a][0], token_to_char[end_tok][1])
        )
    return spans
