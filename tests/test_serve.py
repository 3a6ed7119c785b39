"""Single-document serving path (SURVEY.md S15, fast_api.py parity)."""

import pyarrow as pa
import pyarrow.parquet as pq

from ehr_relation_extraction_ray import synth
from ehr_relation_extraction_ray.pipelines.serve import annotate_document
from ehr_relation_extraction_ray.serial_oracle import assemble_serial


def _one_doc():
    path = synth.transcripts_path("/root/testdata/sf0.001")
    docs = assemble_serial(pq.read_table(path).to_pylist())
    # pick a doc long enough to have >1 RE window (the reference's
    # single-window tail-drop quirk makes short docs emit nothing)
    doc_id, text = max(docs.items(), key=lambda kv: len(kv[1]))
    return doc_id, text


def test_serve_matches_dataset_pipeline(ray_session):
    import ray.data

    from ehr_relation_extraction_ray.stages import candidates, relations

    doc_id, text = _one_doc()
    served = annotate_document(text, doc_id=doc_id)

    docs = ray.data.from_items([{"doc_id": doc_id, "text": text}]).map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("text"),
            "text",
            t["text"].cast(pa.large_string()),
        ),
        batch_format="pyarrow",
    )
    edges = relations.score(candidates.generate(docs))
    trip = edges.map_batches(
        relations.triples_batch, batch_format="pyarrow"
    ).to_pandas()

    got = served["triples"].to_pandas()
    assert len(got) > 0  # real doc -> real relations
    cols = list(got.columns)
    a = got.sort_values(cols).reset_index(drop=True)
    b = trip[cols].sort_values(cols).reset_index(drop=True)
    assert a.equals(b)


def test_serve_needs_no_ray():
    import ray

    _, text = _one_doc()
    out = annotate_document(text)
    assert out["mentions"].num_rows > 0
    assert "<span" in out["html"]
    assert "<table" in out["relation_table_html"]
    # serving one request must not have spun up a Ray session by itself
    # (harmless if a previous test's session is live; the serve module
    # itself never calls ray.init — asserted by module inspection)
    import inspect

    from ehr_relation_extraction_ray.pipelines import serve

    assert "ray.init" not in inspect.getsource(serve)
