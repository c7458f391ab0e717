#!/usr/bin/env python
"""CLI wrapper: generate the deterministic transcripts fixture
(FIXTURES.md §1). Usage:

    python fixtures/gen_transcripts.py OUT_DIR N_TURNS [--seed 42] [--skew N]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pdftotext_spark.sources.transcripts_gen import write_parquet


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir")
    ap.add_argument("n_turns", type=int)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument("--skew", type=int, default=0, help="turns in one mega-conversation")
    args = ap.parse_args()
    t, g = write_parquet(args.out_dir, args.n_turns, args.seed, args.skew)
    print(f"wrote {t}\nwrote {g}")


if __name__ == "__main__":
    main()
