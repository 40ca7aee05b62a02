"""Deterministic synthetic source-code corpus + alias dictionary.

The authoritative input shape (BASELINE.json ``input_hint``) is a Parquet table
``(repo:string, path:string, commit:string, lang:string, content:string)`` of
source-code repositories. No such table ships in ``/root/testdata``, so this
module synthesises it deterministically (seeded, per-file independent RNG) at a
scale proportional to the test-data scale factor, and caches it under
``/tmp/kgray_data/<sf>/``.

Design properties (FIXTURES.md F1/F7):

- **Per-file seeding**: file ``j`` is generated from
  ``RandomState((seed * 1_000_003 + j) mod 2^32)``, so content is identical no
  matter how generation is sharded across Ray tasks — generation at 100k files
  fans out over the cluster and still produces the exact same corpus.
- **Regex-parity grammar**: every entity mention is produced by one of four
  exact line templates (``import M``, ``class C:``, ``def F(...):``,
  ``    v = G(...)``), so gold mentions/triples are recomputable by a DuckDB
  ``regexp_extract_all`` oracle with *no model in the loop*.
- **Zipf-skewed identifiers** with hot keys (``main``, ``utils``, ``init``…)
  so the canonicalization groupby really sees skew (SURVEY.md §7.4).
- **Alias dictionary** (F7): many-to-one aliases with priors and deliberately
  ambiguous hot aliases, for the broadcast entity-linking stage.
"""

from __future__ import annotations

import os
import tempfile
from hashlib import sha256

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SEED = 42
CACHE_ROOT = "/tmp/kgray_data"

# Mention labels, reference BIO suffix style TYPE-B / TYPE-I (config/labels in
# the reference uses the same suffix convention).
LABELS = ("IMPORT", "CLASS", "FUNC", "CALL")

# Regexes defining gold mentions — the SAME patterns back the DuckDB oracle.
MENTION_PATTERNS = {
    "IMPORT": r"import ([A-Za-z_][A-Za-z0-9_]*)",
    "CLASS": r"class ([A-Za-z_][A-Za-z0-9_]*):",
    "FUNC": r"def ([A-Za-z_][A-Za-z0-9_]*)\(",
    "CALL": r"= ([A-Za-z_][A-Za-z0-9_]*)\(",
}

# Triple predicates per mention label (subject = "repo:path").
PREDICATES = {
    "IMPORT": "imports",
    "CLASS": "defines_class",
    "FUNC": "defines_function",
    "CALL": "calls",
}

_HOT_MODULES = ["utils", "main", "core", "common", "config"]
_HOT_FUNCS = ["main", "init", "run", "test", "get_value", "setup", "utils"]
_HOT_CLASSES = ["Base", "Config", "Main", "Handler"]

# words safe for comment lines: never contain the trigger tokens above
_COMMENT_WORDS = [
    "note", "todo", "fixme", "vector", "batch", "stream", "table", "merge",
    "sort", "group", "filter", "window", "hash", "scan", "query", "shuffle",
]

LANGS = ["python", "java", "go", "js"]


def _zipf_pool(hot: list[str], prefix: str, n: int, a: float = 1.1):
    pool = hot + [f"{prefix}_{i:03d}" for i in range(n)]
    ranks = np.arange(1, len(pool) + 1, dtype=np.float64)
    p = 1.0 / ranks**a
    p /= p.sum()
    return pool, p


MODULES, MODULES_P = _zipf_pool(_HOT_MODULES, "module", 200)
FUNCS, FUNCS_P = _zipf_pool(_HOT_FUNCS, "func", 500)
CLASSES, CLASSES_P = _zipf_pool(_HOT_CLASSES, "Class", 300)


def _pick(rs: np.random.RandomState, pool, p) -> str:
    return pool[rs.choice(len(pool), p=p)]


def generate_file(j: int, seed: int = SEED) -> dict:
    """Generate corpus row ``j`` — independent of every other row."""
    rs = np.random.RandomState((seed * 1_000_003 + j) % 2**32)
    repo = f"org{j % 97:04d}/repo{(j * 13) % 389:05d}"
    path = f"src/pkg{rs.randint(10)}/mod_{j:06d}.py"
    commit = sha256(f"commit::{seed}::{j}".encode()).hexdigest()[:40]
    lang = LANGS[rs.choice(4, p=[0.55, 0.2, 0.15, 0.1])]

    lines: list[str] = []
    for _ in range(rs.randint(1, 4)):
        lines.append(f"import {_pick(rs, MODULES, MODULES_P)}")
    lines.append(f"# {' '.join(rs.choice(_COMMENT_WORDS, rs.randint(2, 6)))}")
    for _ in range(rs.randint(0, 3)):
        lines.append(f"class {_pick(rs, CLASSES, CLASSES_P)}:")
        lines.append("    pass")
    for d in range(rs.randint(1, 5)):
        lines.append(f"def {_pick(rs, FUNCS, FUNCS_P)}(arg{d}):")
        for k in range(rs.randint(1, 4)):
            lines.append(f"    v{k} = {_pick(rs, FUNCS, FUNCS_P)}(arg{d})")
        lines.append(f"    return v0")
    content = "\n".join(lines)
    return {"repo": repo, "path": path, "commit": commit, "lang": lang,
            "content": content}


CORPUS_SCHEMA = pa.schema([
    ("repo", pa.string()), ("path", pa.string()), ("commit", pa.string()),
    ("lang", pa.string()), ("content", pa.string()),
])


def generate_files(indices, seed: int = SEED) -> pa.Table:
    rows = [generate_file(int(j), seed) for j in indices]
    return pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)


# Unicode decoration for the real-tokenizer MRC variant: substitutions that
# make the char↔token LCS alignment genuinely non-trivial (no closed form).
# Only _COMMENT_WORDS are touched — they never collide with identifier pools
# or the mention-line templates, so gold MENTIONS stay intact while their
# char OFFSETS shift. Three distortion classes, mirroring what a real
# normalizing tokenizer (ALBERT preprocess_text: NFKD + strip combining +
# ``\x60\x60``/``''`` → ``"``) does to real text:
#  - length-preserving accents (ö → NFKD-stripped "o": chars still MATCH),
#  - length-INCREASING ligatures (ﬁ → "fi": the orig char matches nothing,
#    the token stream gains a char — a band offset the DP must absorb),
#  - length-DECREASING quote pairs (`` → ": two orig chars vs one token
#    char).
UNICODE_DECOR = {
    "note": "nöte",            # ö
    "todo": "tòdo",            # ò
    "fixme": "ﬁxme",           # ﬁ ligature (+1 token char)
    "shuffle": "shuﬀle",       # ﬀ ligature (+1 token char)
    "table": "tablé",          # é
    "merge": "mérge",          # é
    "query": "qüery",          # ü
    "sort": "``sort''",             # quote pairs (−2 token chars)
    "batch": "bätch",          # ä
}


def decorate_unicode(content: str) -> str:
    """Apply :data:`UNICODE_DECOR` — deterministic pure function, shared by
    the ``mrc_token_answers_sp_unicode`` query and its differential tests."""
    for k, v in UNICODE_DECOR.items():
        content = content.replace(k, v)
    return content


# ---------------------------------------------------------------------------
# Alias dictionary (FIXTURES.md F7) — broadcast side of the linking stage.
# ---------------------------------------------------------------------------

def build_alias_table() -> pa.Table:
    """Deterministic alias→entity dictionary with priors.

    - canonical alias for every identifier in the pools (prior 0.9),
    - UPPERCASE variant for every 3rd identifier (prior 0.6),
    - ambiguous hot aliases: each hot name additionally maps to a second
      entity ``ent::<name>_alt`` with a lower prior (0.4), exercising the
      max-prior/tie-break-min-entity resolution rule.
    """
    aliases, entities, priors = [], [], []
    names = list(dict.fromkeys(MODULES + FUNCS + CLASSES))
    for i, name in enumerate(names):
        ent = f"ent::{name.lower()}"
        aliases.append(name); entities.append(ent); priors.append(0.9)
        if i % 3 == 0:
            aliases.append(name.upper()); entities.append(ent); priors.append(0.6)
    for name in _HOT_MODULES + _HOT_FUNCS + _HOT_CLASSES:
        aliases.append(name)
        entities.append(f"ent::{name.lower()}_alt")
        priors.append(0.4)
    return pa.Table.from_pydict(
        {"alias": aliases, "entity_id": entities, "prior": priors},
        schema=pa.schema([("alias", pa.string()), ("entity_id", pa.string()),
                          ("prior", pa.float64())]))


# ---------------------------------------------------------------------------
# Cache management
# ---------------------------------------------------------------------------

def sf_name_of(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir))


def n_files_for(sf_dir: str) -> int:
    """~1e6 files/sf-unit: sf0.001→1k (smoke), sf0.01→10k, sf0.1→100k."""
    name = sf_name_of(sf_dir)
    try:
        sf = float(name.replace("sf", ""))
    except ValueError:
        sf = 0.001
    return max(200, int(1_000_000 * sf))


def corpus_dir(sf_dir: str) -> str:
    return os.path.join(CACHE_ROOT, sf_name_of(sf_dir))


def corpus_parquet_dir(sf_dir: str) -> str:
    """Directory of corpus parquet shards (ray.data.read_parquet target)."""
    return os.path.join(corpus_dir(sf_dir), "corpus")


def corpus_glob(sf_dir: str) -> str:
    """Glob form for DuckDB ``read_parquet('...*.parquet')`` oracles."""
    return os.path.join(corpus_parquet_dir(sf_dir), "*.parquet")


def alias_path(sf_dir: str) -> str:
    return os.path.join(corpus_dir(sf_dir), "alias.parquet")


def _shard_size(n_files: int) -> int:
    """Files per generated parquet shard.

    Small floor keeps multiple shards at smoke scale (wave/resume
    granularity needs >1 file); the cap at ~128 shards keeps
    ``read_parquet``'s driver-side metadata fetch cheap — it is SERIAL per
    file (~7 ms each), so thousands of small shards put tens of seconds of
    constant time on the driver."""
    return max(250, -(-n_files // 128))


def ensure_corpus(sf_dir: str, seed: int = SEED) -> str:
    """Idempotently materialize the corpus + alias dict cache for ``sf_dir``.

    Atomic (write to tempdir, rename); per-file seeding makes the content
    independent of sharding. Large scales generate through Ray tasks.
    Returns the corpus glob.
    """
    root = corpus_dir(sf_dir)
    done = os.path.join(root, "_DONE")
    if os.path.exists(done):
        return corpus_glob(sf_dir)
    os.makedirs(CACHE_ROOT, exist_ok=True)
    n = n_files_for(sf_dir)
    tmp = tempfile.mkdtemp(prefix="kgray_gen_", dir=CACHE_ROOT)
    cdir = os.path.join(tmp, "corpus")
    os.makedirs(cdir)
    step = _shard_size(n)
    shards = [(lo, min(lo + step, n)) for lo in range(0, n, step)]
    if n <= 20_000:
        for si, (lo, hi) in enumerate(shards):
            pq.write_table(generate_files(range(lo, hi), seed),
                           os.path.join(cdir, f"shard-{si:05d}.parquet"))
    else:
        import ray

        @ray.remote(num_cpus=1)
        def _gen(si: int, lo: int, hi: int) -> str:
            pq.write_table(generate_files(range(lo, hi), seed),
                           os.path.join(cdir, f"shard-{si:05d}.parquet"))
            return ""
        ray.get([_gen.remote(si, lo, hi) for si, (lo, hi) in enumerate(shards)])
    pq.write_table(build_alias_table(), os.path.join(tmp, "alias.parquet"))
    with open(os.path.join(tmp, "_DONE"), "w") as f:
        f.write(f"n_files={n} seed={seed}\n")
    try:
        os.rename(tmp, root)
    except OSError:
        # concurrent generator won the rename race — use theirs
        import shutil
        if os.path.exists(done):
            shutil.rmtree(tmp, ignore_errors=True)
        else:
            raise
    return corpus_glob(sf_dir)
