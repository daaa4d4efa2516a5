"""spark-submit entry point.

Usage (cluster):
    spark-submit --py-files kgp.zip kgp/job.py \
        --input /path/to/transcripts_parquet --vocab /path/to/vocab_parquet \
        --out /path/to/warehouse

Usage (synthetic, local):
    python -m kgp.job --synth-convs 2000 --synth-entities 500 --out /tmp/kgp_out
"""

from __future__ import annotations

import argparse
import time


def main(argv: list[str] | None = None) -> None:
    ap = argparse.ArgumentParser(description="kgp knowledge-graph construction job")
    ap.add_argument("--input", help="parquet dir of transcripts (conv_id,turn_idx,role,text,tool,ts)")
    ap.add_argument("--vocab", help="parquet dir of entity vocabulary")
    ap.add_argument("--synth-convs", type=int, default=0, help="generate N synthetic conversations instead of --input")
    ap.add_argument("--synth-entities", type=int, default=500)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--out", required=True, help="output warehouse root")
    ap.add_argument("--master", default=None)
    ap.add_argument("--force", action="store_true", help="recompute all stages")
    args = ap.parse_args(argv)

    from .session import get_spark
    from .pipeline import run_pipeline

    spark = get_spark(master=args.master, app_name="kgp-job")
    try:
        if args.synth_convs:
            from .synth import gen_entity_vocab, gen_transcripts_spark

            vocab_pdf = gen_entity_vocab(args.synth_entities, args.seed)
            transcripts = gen_transcripts_spark(spark, args.synth_convs, vocab_pdf, args.seed)
            vocab = spark.createDataFrame(vocab_pdf)
            fingerprint = f"synth:{args.synth_convs}:{args.synth_entities}:{args.seed}"
        else:
            if not args.input or not args.vocab:
                ap.error("either --synth-convs or both --input and --vocab are required")
            transcripts = spark.read.parquet(args.input)
            vocab = spark.read.parquet(args.vocab)
            fingerprint = f"path:{args.input}:{args.vocab}"

        t0 = time.monotonic()
        out = run_pipeline(spark, transcripts, vocab, args.out, fingerprint, force=args.force)
        elapsed = time.monotonic() - t0
        n_turns = out["ordered"].count()
        n_triples = out["triples"].count()
        print(f"kgp-job done: {n_turns} turns -> {n_triples} triples in {elapsed:.1f}s "
              f"({n_turns / max(elapsed, 1e-9):.0f} turns/s); recomputed={out['recomputed']}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
