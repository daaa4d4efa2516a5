"""Persisted deterministic transcript corpus — the driver-visible fixture.

The north-rule flagship (S1→S5 over multi-turn transcripts) was rows-only
through round 3 because its corpus was synthesized in-process and DuckDB
could never see it.  This module persists the SAME seeded generator output
(kgp.synth, pure function of SEED — see FIXTURES.md) as two parquet files
under the repo's ``fixtures/`` directory, so BOTH engines read identical
bytes:

- ``fixtures/transcripts.parquet`` — (conv_id, turn_idx, role, text, tool,
  ts), rows in the generator's seeded-shuffle order (S1's window ordering
  stays load-bearing, reference src/features/embed_paragraphs.py:20-23);
- ``fixtures/entity_vocab.parquet`` — (entity_id, canonical_name,
  entity_type, aliases array<string>), the gazetteer + alias map analog
  (reference notebooks/entity_alias_mapping.ipynb cell-3, cell-29).

The files are committed to git AND regenerated on demand (atomic tmp+rename,
content identical by seeding), so the oracle SQL can reference them by
absolute path from a static string.  Corpus size (n_conv=1000, n_ent=500,
alias chains deepened by synth.extend_alias_chains — grown 4x in round 5 per
the r4 verdict so the in-gate blocking/difflib/CC SQL sees multi-block
candidate sets and a >20-node component) stays sf-independent by design:
the flagship GATE checks semantics; scale is bench_scaling.py's job.
"""

from __future__ import annotations

import os

import pandas as pd

N_ENT = 500
N_CONV = 1000

FIXTURE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures")
TRANSCRIPTS_PATH = os.path.join(FIXTURE_DIR, "transcripts.parquet")
VOCAB_PATH = os.path.join(FIXTURE_DIR, "entity_vocab.parquet")


def _atomic_write(df: pd.DataFrame, path: str) -> None:
    tmp = f"{path}.tmp.{os.getpid()}"
    df.to_parquet(tmp, index=False)
    os.replace(tmp, path)  # atomic on POSIX — concurrent writers converge


def ensure_fixture() -> tuple[str, str]:
    """Write-if-missing; returns (transcripts_path, vocab_path).

    Regeneration is bit-stable at the ROW level (seeded numpy streams);
    parquet framing may differ across library versions, so existing files
    are never rewritten — delete them to force a refresh."""
    from . import synth

    if not (os.path.exists(TRANSCRIPTS_PATH) and os.path.exists(VOCAB_PATH)):
        os.makedirs(FIXTURE_DIR, exist_ok=True)
        vocab = synth.extend_alias_chains(synth.gen_entity_vocab(N_ENT))
        transcripts = synth.gen_transcripts_pandas(N_CONV, vocab)
        # us-precision timestamps: ns would round-trip fine through both
        # engines today, but us is the parquet logical type every reader
        # (Spark/DuckDB/pyarrow) treats identically
        transcripts = transcripts.assign(ts=transcripts["ts"].astype("datetime64[us]"))
        _atomic_write(transcripts, TRANSCRIPTS_PATH)
        _atomic_write(vocab, VOCAB_PATH)
    return TRANSCRIPTS_PATH, VOCAB_PATH


def load_vocab_pd() -> pd.DataFrame:
    ensure_fixture()
    df = pd.read_parquet(VOCAB_PATH)
    # parquet round-trips the aliases column as numpy arrays; the matcher
    # and linking stages expect python lists (synth emits lists)
    return df.assign(aliases=df["aliases"].map(list))


def load_transcripts(spark):
    """The flagship input table, read from the persisted fixture — the
    same (conv_id, turn_idx, role, text, tool, ts) shape the north rule's
    Iceberg source carries (io.TableIO is the catalog seam)."""
    from pyspark.sql import functions as F

    path, _ = ensure_fixture()
    df = spark.read.parquet(path)
    # parquet NTZ timestamps surface as timestamp_ntz on Spark 4; the
    # pipeline's schema contract (schemas.TRANSCRIPTS) is plain timestamp
    return df.withColumn("ts", F.col("ts").cast("timestamp"))
