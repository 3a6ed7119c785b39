"""Single-document serving pipeline (SURVEY.md S15).

The reference serves one EHR document per request through a FastAPI app
(``fast_api.py:29-56``: POST body -> NER -> RE -> highlighted HTML +
relation table; ``fast_api.py:59-62``: canned sample). The engine's
equivalent is :func:`annotate_document`: the SAME per-batch kernels the
Dataset stages run, invoked directly on a one-row Arrow batch — serving a
single request must not spin up a cluster job, and because every stage is
a pure batch function the two paths cannot diverge (the Dataset pipeline
is map_batches over exactly these callables).

No Ray session is created or required here (driver contract: only
bench/CLI/test fixtures own a session).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import pyarrow as pa

from ..stages.candidates import CandidateGenerator
from ..stages.graph import render_doc_html, render_wide_html, wide_table_rows
from ..stages.mentions import DictionaryDetector
from ..stages.relations import RelationScorer, triples_batch


def annotate_document(
    text: str,
    doc_id: str = "doc-0",
    patterns: Optional[Dict[str, str]] = None,
    scorer_factory: Optional[Callable] = None,
    html: bool = True,
) -> Dict[str, object]:
    """One document -> mentions / edges / triples (+ HTML renders).

    Mirrors the reference request flow (``fast_api.py:29-56``):
    ``get_ner_predictions`` -> ``get_re_predictions`` -> ``display_ehr`` +
    ``get_relation_table``. Returns Arrow tables (the engine's wire
    format) plus the two HTML renders when ``html=True``.
    """
    batch = pa.table(
        {
            "doc_id": pa.array([doc_id], pa.string()),
            "text": pa.array([text], pa.large_string()),
        }
    )
    mentions = DictionaryDetector(patterns)(batch)
    cands = CandidateGenerator(patterns=patterns)(batch)
    edges = RelationScorer(scorer_factory)(cands)
    triples = triples_batch(edges)
    out: Dict[str, object] = {
        "doc_id": doc_id,
        "mentions": mentions,
        "edges": edges,
        "triples": triples,
    }
    if html:
        out["html"] = render_doc_html(text, mentions)
        out["relation_table_html"] = render_wide_html(wide_table_rows(triples))
    return out
