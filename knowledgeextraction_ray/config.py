"""Typed pipeline configuration.

Replaces the reference's JSON-attribute config object ``KGEConfig``
(``knowledgeextractor/__init__.py:5-24`` — which never recursed into nested
dicts due to the ``type(v)==dict()`` bug) with plain dataclasses: one config
per pipeline run, logged into lineage manifests.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field


@dataclass(frozen=True)
class SegmentConfig:
    """Segmentation knobs (reference ``config/crf_processor.json`` +
    ``crf_gen_taggers.py:283-311``)."""

    max_seq_length: int = 384        # incl. [CLS]/[SEP] → 382 payload chars
    min_sequence_length: int = 4     # drop segments shorter than this (M7 analog)

    @property
    def max_payload(self) -> int:
        return self.max_seq_length - 2


@dataclass(frozen=True)
class ScorerConfig:
    """NER scorer decode knobs.

    The reference decodes with per-token argmax of the softmax
    (``nermodels/crf_albert.py:144-145``) even though a CRF transitions matrix
    is learned at train time. ``decode="argmax"`` is the parity mode;
    ``decode="viterbi"`` applies BIO-constrained Viterbi over the same logits
    (the north-star decode) — identical output whenever logits are confident.
    """

    decode: str = "argmax"           # "argmax" | "viterbi"
    # "rule" = deterministic grammar tagger; "dense" = numpy mini-encoder
    # (real matmul shapes, rule-biased emissions — same tags, real tensor
    # cost; see stages/ner_scorer.DenseCharTagModel)
    model: str = "rule"
    batch_size: int = 512
    concurrency: int | None = None   # None → sized from the live cluster
    num_cpus: float = 1.0


@dataclass(frozen=True)
class CanonicalizeConfig:
    """Skew-safe canonicalization: two-phase salted groupby.

    ``num_salts`` shards each hot normalized-surface key into sub-keys for the
    partial aggregate; the final aggregate re-merges per key. Partial states
    are associative (counts + best-prior candidate)."""

    num_salts: int = 8


@dataclass(frozen=True)
class OutputConfig:
    num_partitions: int = 16         # subject-hash output partitions
    path: str = "/tmp/kgray_out"


@dataclass(frozen=True)
class PipelineConfig:
    segment: SegmentConfig = field(default_factory=SegmentConfig)
    scorer: ScorerConfig = field(default_factory=ScorerConfig)
    canonicalize: CanonicalizeConfig = field(default_factory=CanonicalizeConfig)
    output: OutputConfig = field(default_factory=OutputConfig)
    read_batch_size: int = 256       # rows (files) per map_batches call

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self), sort_keys=True)
