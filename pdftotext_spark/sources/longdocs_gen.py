"""Deterministic LONG-document corpus generator with planted truth.

VERDICT r5 → r6 #1: every r5 shingle-family tuning decision (the
``SPARK_GRAFT_SHINGLE_KEEP16`` = 4/16 sampling rate, LSH band
selectivity, containment candidacy) was validated on the driver's
~300-char synthetic ``documents`` table, while the corpus this engine
targets is multi-KB web text.  This module produces a seeded corpus of
documents across three length regimes (~300 chars / ~3 KB / ~20 KB)
whose duplicate structure is PLANTED and therefore exactly known, so
per-rate candidate recall and cost can be *measured* instead of
extrapolated:

- ``exact`` pairs    — verbatim duplicates (Jaccard 1.0);
- ``neardup@J`` pairs — a shared contiguous block sized for target
  shingle-Jaccard J ∈ {0.9, 0.7, 0.5} (block fraction 2J/(1+J) of the
  doc), unique prefix/suffix otherwise;
- ``span`` pairs     — two otherwise-unique docs sharing ONE exact
  contiguous span (~20 % of the doc, ≥120 chars): below the banded-
  MinHash operating point by design, the ExactSubstr/winnowing target;
- ``containment`` pairs — a short doc verbatim inside a much longer
  host (medium/long regimes; the directional signal MinHash misses);
- unique background docs.

Vocabulary is collision-free by construction: word *i* is the first
12 urlsafe-base64 chars of md5(``"w:{i}"``) with a GLOBAL counter, so
no 8-gram shingle is ever shared between two documents except through
a planted structure.  The alphabet width matters: with 12 *hex* chars
the sub-word 8-gram space is only 16^8 ≈ 4.3e9 and a ~1 MB corpus
already produces birthday collisions (measured: background docs
picked up 8–16 accidental duplicated chars); base64 widens it to
64^8 ≈ 2.8e14, collision-free up to ~100 MB corpora.  Sequential
counter words like ``w0000123`` would be far worse — every document
would share the `` w00001`` shingles.
That makes the ExactSubstr ground truth *exact*: a planted shared
region of length L contributes exactly L duplicated chars to each
member (positions of 8-grams fully inside the region → merged island
spans the region), and background docs contribute 0.

No Spark dependency — writes ``documents.parquet`` via pyarrow in the
driver layout (a directory with one part file, readable by both
``spark.read.parquet`` and DuckDB's ``read_parquet(dir/*.parquet)``).
"""

from __future__ import annotations

import base64
import hashlib
import os
import random
from dataclasses import dataclass, field

REGIMES = {"short": 300, "medium": 3000, "long": 20000}
J_LEVELS = (0.9, 0.7, 0.5)
WORD_LEN = 12  # + 1 separator space → 13 chars per word


@dataclass
class LongdocTruth:
    """Planted structure of a generated corpus.

    ``pairs`` maps (doc_a, doc_b) with doc_a < doc_b to a dict with
    ``kind`` ∈ {exact, neardup, span, containment}, ``regime``, and
    for neardup pairs the target ``j``.  ``dup_chars`` is the EXACT
    expected `duplicated_span_fraction` char count per doc (0 for
    background).  ``shared_chars`` per pair is the planted shared
    contiguous length (= doc length for exact pairs).
    """

    regime: dict[int, str] = field(default_factory=dict)
    pairs: dict[tuple[int, int], dict] = field(default_factory=dict)
    dup_chars: dict[int, int] = field(default_factory=dict)
    n_chars: dict[int, int] = field(default_factory=dict)
    background: set[int] = field(default_factory=set)

    def pairs_of(self, kind: str, regime: str | None = None, j: float | None = None):
        return {
            p
            for p, m in self.pairs.items()
            if m["kind"] == kind
            and (regime is None or m["regime"] == regime)
            and (j is None or m.get("j") == j)
        }


class _Vocab:
    """Global collision-free word source: word i = the first 12
    urlsafe-base64 chars of md5('w:i') (see module docstring for why
    the alphabet must be wider than hex)."""

    def __init__(self) -> None:
        self._i = 0

    def words(self, n: int) -> str:
        out = []
        for _ in range(n):
            digest = hashlib.md5(f"w:{self._i}".encode()).digest()
            out.append(
                base64.urlsafe_b64encode(digest).decode()[:WORD_LEN]
            )
            self._i += 1
        return " ".join(out)


def _n_words(target_chars: int, rng: random.Random, jitter: bool = True) -> int:
    base = max(20, target_chars // (WORD_LEN + 1))
    if jitter:
        base = max(20, int(base * rng.uniform(0.7, 1.5)))
    return base


def make_longdocs(
    out_dir: str,
    scale: int = 1,
    seed: int = 13,
    regimes: dict[str, int] | None = None,
) -> LongdocTruth:
    """Generate the corpus under ``out_dir/documents.parquet`` and
    return its :class:`LongdocTruth`.  Per regime: ``12*scale``
    background docs, ``2*scale`` near-dup pairs per J level,
    ``scale`` exact pairs, ``scale`` span pairs, and (medium/long)
    ``scale`` containment pairs.  Deterministic in (scale, seed,
    regimes)."""
    regimes = dict(regimes or REGIMES)
    rng = random.Random(seed)
    vocab = _Vocab()
    truth = LongdocTruth()
    rows: list[tuple[int, str, str]] = []
    next_id = 1

    def add(text: str, regime: str) -> int:
        nonlocal next_id
        did = next_id
        next_id += 1
        rows.append((did, text, f"web{did % 4}"))
        truth.regime[did] = regime
        truth.n_chars[did] = len(text)
        truth.dup_chars.setdefault(did, 0)
        return did

    for regime, target in regimes.items():
        # background
        for _ in range(12 * scale):
            did = add(vocab.words(_n_words(target, rng)), regime)
            truth.background.add(did)
        # exact pairs
        for _ in range(scale):
            text = vocab.words(_n_words(target, rng))
            a = add(text, regime)
            b = add(text, regime)
            truth.pairs[(a, b)] = {
                "kind": "exact", "regime": regime, "shared_chars": len(text)
            }
            truth.dup_chars[a] = truth.dup_chars[b] = len(text)
        # near-dup pairs: shared block fraction 2J/(1+J), unique rest
        for j in J_LEVELS:
            for _ in range(2 * scale):
                nw = _n_words(target, rng)
                sw = max(10, round(nw * 2 * j / (1 + j)))
                uw = max(2, nw - sw)
                shared = vocab.words(sw)
                a = add(vocab.words(uw) + " " + shared, regime)
                b = add(shared + " " + vocab.words(uw), regime)
                truth.pairs[(a, b)] = {
                    "kind": "neardup", "regime": regime, "j": j,
                    "shared_chars": len(shared),
                }
                truth.dup_chars[a] += len(shared)
                truth.dup_chars[b] += len(shared)
        # span pairs: ONE shared contiguous span ~20% of the doc,
        # >=120 chars -> below LSH's operating point, found by
        # ExactSubstr / winnowing
        for _ in range(scale):
            nw = _n_words(target, rng)
            sw = max(10, round(nw * 0.2))
            span = vocab.words(sw)
            halves = (nw - sw) // 2
            a = add(
                vocab.words(halves) + " " + span + " " + vocab.words(halves),
                regime,
            )
            b = add(
                vocab.words(halves) + " " + span + " " + vocab.words(halves),
                regime,
            )
            truth.pairs[(a, b)] = {
                "kind": "span", "regime": regime, "shared_chars": len(span)
            }
            # both members embed " " + span + " " — the flanking
            # spaces are part of the shared contiguous region (the
            # 8-grams anchored on them match too), so the exact
            # ExactSubstr island is len(span) + 2 in each doc
            truth.dup_chars[a] += len(span) + 2
            truth.dup_chars[b] += len(span) + 2
        # containment pairs: inner doc verbatim inside a host
        if target >= 1000:
            for _ in range(scale):
                inner_text = vocab.words(
                    max(30, _n_words(target, rng, jitter=False) // 6)
                )
                inner = add(inner_text, regime)
                hw = _n_words(target, rng) // 2
                host = add(
                    vocab.words(hw) + " " + inner_text + " " + vocab.words(hw),
                    regime,
                )
                truth.pairs[(inner, host)] = {
                    "kind": "containment", "regime": regime,
                    "shared_chars": len(inner_text),
                }
                truth.dup_chars[inner] += len(inner_text)
                truth.dup_chars[host] += len(inner_text)

    import pyarrow as pa
    import pyarrow.parquet as pq

    d = os.path.join(out_dir, "documents.parquet")
    os.makedirs(d, exist_ok=True)
    # shard into multiple part files: Spark parallelizes parquet scans
    # per file (below maxPartitionBytes a single file = ONE task, and
    # the whole downstream explode/window chain would run serially —
    # measured: the r6 rate-curve bench sat on one core for 40 min)
    n_shards = min(16, max(1, len(rows) // 16))
    for shard in range(n_shards):
        part = rows[shard::n_shards]
        table = pa.table(
            {
                "doc_id": pa.array([r[0] for r in part], pa.int64()),
                "text": pa.array([r[1] for r in part], pa.string()),
                "source": pa.array([r[2] for r in part], pa.string()),
            }
        )
        pq.write_table(table, os.path.join(d, f"part-{shard}.parquet"))
    return truth
