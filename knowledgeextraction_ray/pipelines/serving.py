"""Batch serving surface — the reference's HTTP response envelopes.

The Tornado server itself is n/a by design (S11 — a batch engine replaces
request serving), but its RESPONSE CONTRACTS are mirrored exactly so a
client of the reference can point at these functions:

- :func:`crf_process` = ``CRFServer.processCore`` (``ner_server.py:11-28``):
  ``{"predictions": [{"words": [...], "tags": [...]}, ...],
  "query_list": [...]}`` with predictions in query order.
- :func:`mrc_process` = ``MRCServer.processCore`` (``ner_server.py:34-56``):
  a list of ``{"guid", "entities", "probabilities", "na_prob"}``.
- :func:`nre_process` = ``nremodels/models.py:10-18`` ``_BaseModel.predict``:
  one ``(relation, score)`` pair per query item.

Every function computes through the same Dataset stages as the batch
pipelines and keys rows by an explicit query index — never by zip position
(the reference's silent-misalignment fragility, ``eval_estimator.py:78-85``).
"""

from __future__ import annotations

import pyarrow as pa
import ray.data as rd

from ..config import PipelineConfig


def crf_process(query_list: list[str],
                cfg: PipelineConfig | None = None) -> dict:
    """NER serving: texts → ``{"predictions": [...], "query_list": [...]}``."""
    assert type(query_list) == list                  # reference guard
    cfg = cfg or PipelineConfig()
    from ..stages.ner_scorer import LABEL_LIST, score_dataset
    ds = rd.from_items([
        {"qidx": i, "text": t[:cfg.segment.max_payload]}
        for i, t in enumerate(query_list)])
    scored = score_dataset(ds, cfg.scorer, cfg.segment).to_pandas()
    scored = scored.sort_values("qidx")
    preds = [{"words": list(r["text"]),
              "tags": [LABEL_LIST[i] for i in r["tag_ids"]]}
             for _, r in scored.iterrows()]
    return {"predictions": preds, "query_list": query_list}


def mrc_process(query_list: list[dict],
                null_threshold: float | None = None) -> list[dict]:
    """MRC serving: ``[{"qas_id", "question", "context"}, ...]`` →
    ``[{"guid", "entities", "probabilities", "na_prob"}, ...]``.

    ``null_threshold=None`` mirrors the server path (``mrc_albert.py``
    calls ``get_predictions_v2`` with ``null_score_diff_threshold=None``)."""
    assert type(query_list) == list
    from ..stages.mrc import MrcWindowScorer, QTYPE_OF, nbest_merge
    rows = [{"example_id": q["qas_id"], "question": q["question"],
             "context": q["context"]} for q in query_list]
    for q in rows:
        if q["question"] not in QTYPE_OF:
            raise ValueError(f"unknown question prompt: {q['question']!r}")
    scored = rd.from_items(rows).map_batches(MrcWindowScorer,
                                             batch_format="pyarrow",
                                             concurrency=(1, 2))
    merged = nbest_merge(scored, null_threshold=null_threshold).to_pandas()
    by_id = merged.set_index("example_id")
    out = []
    for q in query_list:
        r = by_id.loc[q["qas_id"]]
        out.append({"guid": q["qas_id"],
                    "entities": list(r["entities"]),
                    "probabilities": [float(p) for p in r["probabilities"]],
                    "na_prob": float(r["na_prob"])})
    return out


def nre_process(query_list: list[dict]) -> list[tuple[str, float]]:
    """NRE serving: OpenNRE-style items ``{"text", "h": {"pos": [s, e]},
    "t": {"pos": [s, e]}}`` → one ``(relation, score)`` per item
    (``_BaseModel.predict``)."""
    assert type(query_list) == list
    from ..stages.nre import NreScorer
    tab = pa.Table.from_pydict({
        "qidx": list(range(len(query_list))),
        "guid": [f"q{i}" for i in range(len(query_list))],
        "repo": [""] * len(query_list),
        "path": [""] * len(query_list),
        "text": [q["text"] for q in query_list],
        "head_surface": [q["text"][q["h"]["pos"][0]:q["h"]["pos"][1]]
                         for q in query_list],
        "tail_surface": [q["text"][q["t"]["pos"][0]:q["t"]["pos"][1]]
                         for q in query_list],
        "h_start": pa.array([q["h"]["pos"][0] for q in query_list],
                            pa.int32()),
        "h_end": pa.array([q["h"]["pos"][1] for q in query_list],
                          pa.int32()),
        "t_start": pa.array([q["t"]["pos"][0] for q in query_list],
                            pa.int32()),
        "t_end": pa.array([q["t"]["pos"][1] for q in query_list],
                          pa.int32()),
    })
    scored = (rd.from_arrow(tab)
              .map_batches(NreScorer, batch_format="pyarrow",
                           concurrency=(1, 2))
              .to_pandas().sort_values("qidx"))
    return [(r["relation"], float(r["score"]))
            for _, r in scored.iterrows()]
