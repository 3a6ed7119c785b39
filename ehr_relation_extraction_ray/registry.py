"""User-extension registries (SURVEY.md §2.10).

The reference exposes pluggability as string-keyed registries: tokenizers
(generate_data.py:140-181), NER model names (predict.py:301-338), glue
task processors (biobert_re/data_processor.py:144-148). Same surface
here — a registered name resolves to a callable/class that slots into the
corresponding ``map_batches`` stage:

* ``tokenizer``: ``str -> List[str]`` (default: whitespace, M2)
* ``detector``: class with ``__call__(pa.Table) -> pa.Table`` emitting
  MENTIONS rows (dictionary/regex default, A4; BioBERT actor, A1)
* ``scorer``: class emitting scored CANDIDATES (surrogate default; BioBERT
  actor, A3)

Registrations are plain module-level dicts — importable by every Ray
worker, no driver-held state to ship.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

_REGISTRIES: Dict[str, Dict[str, Any]] = {
    "tokenizer": {},
    "detector": {},
    "scorer": {},
    "embedder": {},
}


def register(kind: str, name: str) -> Callable[[Any], Any]:
    """Decorator: ``@register("detector", "dictionary")``."""
    if kind not in _REGISTRIES:
        raise KeyError(f"unknown registry {kind!r}; have {list(_REGISTRIES)}")

    def deco(obj: Any) -> Any:
        _REGISTRIES[kind][name] = obj
        return obj

    return deco


def get(kind: str, name: str) -> Any:
    try:
        return _REGISTRIES[kind][name]
    except KeyError:
        raise KeyError(
            f"no {kind!r} named {name!r}; registered: {sorted(_REGISTRIES[kind])}"
        ) from None


def names(kind: str):
    return sorted(_REGISTRIES[kind])


_SCISPACY_NLP = None


def _scispacy_tokenizer(text: str):
    """scispacy tokenizer slot (SURVEY.md M3/A5; reference
    generate_data.py:140-181 tokenizes with ``en_core_sci_sm``'s pipeline).

    Lazily loads the spacy model once per process on first call; pair with
    ``is_bert_tokenizer=False`` (the scispacy double-space quirk of
    ehr.py:220-223). Import-gated: scispacy/spacy are not shipped in this
    environment, so absent installs raise a clear NotImplementedError
    instead of failing deep inside a Ray task.
    """
    global _SCISPACY_NLP
    if _SCISPACY_NLP is None:
        try:
            import spacy

            _SCISPACY_NLP = spacy.load("en_core_sci_sm")
        except Exception as exc:  # noqa: BLE001 — ImportError or missing model
            raise NotImplementedError(
                "tokenizer='scispacy' needs scispacy + the en_core_sci_sm "
                "model installed (reference generate_data.py:140-181); "
                "neither ships in this environment"
            ) from exc
    return [t.text for t in _SCISPACY_NLP(text)]


def _elmo_embedder(*args, **kwargs):
    """ELMo embedder slot (SURVEY.md A6; reference ehr.py:486-497
    set_elmo_embedder). Import-gated: allennlp + the 5.5B ELMo weights are
    not shipped; the feature contract (texts -> [B, D] float vectors) is
    the same one stages/embed.HashEmbedder fulfills."""
    try:
        from allennlp.commands.elmo import ElmoEmbedder  # noqa: F401
    except Exception as exc:
        raise NotImplementedError(
            "embedder='elmo' needs allennlp + ELMo weights (not shipped in "
            "this container); use embedder='hash' or register your own"
        ) from exc
    raise NotImplementedError("wire ElmoEmbedder weights here")


def _register_defaults() -> None:
    from .functions.rescore import SurrogateScorer
    from .functions.tokenize import tokens_of
    from .stages.mentions import DictionaryDetector

    from .functions.wordpiece import ToyWordpieceTokenizer
    from .stages.mentions import HFTokenClassifier, WordpieceNERDetector

    _REGISTRIES["tokenizer"].setdefault("default", tokens_of)
    _REGISTRIES["tokenizer"].setdefault("wordpiece-toy", ToyWordpieceTokenizer())
    _REGISTRIES["tokenizer"].setdefault("scispacy", _scispacy_tokenizer)
    _REGISTRIES["detector"].setdefault("dictionary", DictionaryDetector)
    # model-backed NER cascade (M6-M8 plumbing); pair with HFTokenClassifier
    # for real BioBERT weights or a surrogate logits_fn in tests
    _REGISTRIES["detector"].setdefault("wordpiece", WordpieceNERDetector)
    from .stages.embed import HashEmbedder

    _REGISTRIES["embedder"].setdefault("hash", HashEmbedder)
    _REGISTRIES["embedder"].setdefault("elmo", _elmo_embedder)
    _REGISTRIES["scorer"].setdefault("surrogate", SurrogateScorer)
    _REGISTRIES["scorer"].setdefault("biobert-ner", HFTokenClassifier)
    try:  # optional heavy backends (import-gated; absent in this container)
        from .functions.rescore import HFScorer

        _REGISTRIES["scorer"].setdefault("biobert", HFScorer)
    except Exception:  # noqa: BLE001
        pass


_register_defaults()
