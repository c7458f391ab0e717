"""Deterministic transcripts-table generator (FIXTURES.md §1).

Produces the authoritative input shape from BASELINE.json
``input_hint`` — ``(conv_id string, turn_idx int32, role string,
text string, tool string, ts timestamp)`` — with payload kinds
``pdf-ascii`` / ``pdf-b64`` / ``html`` / ``plain`` and a sidecar
golden table ``(conv_id, turn_idx, expected_text)`` where every
expected text is known *by construction*.

Seeded (default 42); conversation sizes follow a truncated Zipf so a
few mega-conversations exist (the skew fixture the salted repartition
in :mod:`pdftotext_spark.plans.pipeline` is designed for).
"""

from __future__ import annotations

import base64
import random
from datetime import datetime, timedelta, timezone

from pdftotext_spark.sources import pdfbuilder as pb

ROLES = ("user", "assistant", "tool")

_WORDS = (
    "data pipeline spark extraction transcript turn conversation text "
    "document page stream token filter font glyph layout content "
    "analysis quality metric partition shuffle broadcast window batch "
    "vector arrow schema golden deterministic scale throughput"
).split()


def _sentence(rng: random.Random, n_words: int) -> str:
    words = [rng.choice(_WORDS) for _ in range(n_words)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def _paragraph(rng: random.Random, n_sentences: int = 3) -> str:
    return " ".join(_sentence(rng, rng.randint(8, 16)) for _ in range(n_sentences))


def _html_payload(rng: random.Random) -> tuple[str, str]:
    """Boilerplate-wrapped HTML; golden = the main paragraphs."""
    paras = [_paragraph(rng) for _ in range(rng.randint(1, 3))]
    nav = "".join(f'<li><a href="/p{i}">Item {i}</a></li>' for i in range(6))
    body = "".join(f"<p>{p}</p>" for p in paras)
    html = (
        "<!DOCTYPE html><html><head><title>x</title>"
        "<script>var t = 1;</script><style>.a{color:blue}</style></head>"
        f"<body><header><nav><ul>{nav}</ul></nav></header>"
        f"<article>{body}</article>"
        '<footer><p><a href="/tos">Terms</a> <a href="/p">Privacy</a> '
        "<a href=\"/c\">Contact</a></p></footer></body></html>"
    )
    return html, "\n".join(paras)


def _pdf_lines(rng: random.Random) -> list[list[str]]:
    n_pages = rng.randint(1, 3)
    return [
        [_sentence(rng, rng.randint(5, 10)) for _ in range(rng.randint(2, 5))]
        for _ in range(n_pages)
    ]


def _pdf_ascii_payload(rng: random.Random) -> tuple[str, str]:
    """ASCII-safe PDF stored verbatim (ASCIIHex- or A85-filtered or
    uncompressed streams only)."""
    pages = _pdf_lines(rng)
    filt = rng.choice([None, "ASCIIHexDecode", "ASCII85Decode"])
    pdf = pb.simple_pdf(pages, stream_filter=filt)
    golden = "\n".join("\n".join(p) for p in pages)
    return pdf.decode("latin-1"), golden


def _pdf_b64_payload(rng: random.Random) -> tuple[str, str]:
    """Binary PDF (Flate/LZW/ObjStm/ToUnicode/CID variants),
    base64-wrapped behind the %B64% sentinel (SURVEY.md §7.5)."""
    variant = rng.randrange(7)
    if variant == 0:
        pages = _pdf_lines(rng)
        pdf = pb.simple_pdf(pages, stream_filter="FlateDecode")
        golden = "\n".join("\n".join(p) for p in pages)
    elif variant == 1:
        pages = _pdf_lines(rng)
        pdf = pb.simple_pdf(pages, stream_filter="LZWDecode")
        golden = "\n".join("\n".join(p) for p in pages)
    elif variant == 2:
        pdf, golden = pb.tounicode_pdf(_sentence(rng, 6), mode="bfchar")
    elif variant == 3:
        pdf, golden = pb.tounicode_pdf(_sentence(rng, 8), mode="bfrange")
    elif variant == 4:
        pdf, golden = pb.identity_h_pdf(_sentence(rng, 5))
    elif variant == 5:
        pdf, golden = pb.objstm_pdf(_sentence(rng, 7))
    else:
        pdf, golden = pb.differences_pdf()
    return "%B64%" + base64.b64encode(pdf).decode("ascii"), golden


def _plain_payload(rng: random.Random) -> tuple[str, str]:
    text = _paragraph(rng, rng.randint(1, 2))
    return text, text


_KIND_BUILDERS = {
    "pdf-ascii": _pdf_ascii_payload,
    "pdf-b64": _pdf_b64_payload,
    "html": _html_payload,
    "plain": _plain_payload,
}
# relative frequency of payload kinds per turn
_KIND_CYCLE = (
    "plain", "html", "pdf-ascii", "pdf-b64", "plain", "html",
    "pdf-b64", "plain", "pdf-ascii", "html",
)


def conversation_sizes(n_convs: int, rng: random.Random, zipf_a: float = 1.3, max_turns: int = 2000) -> list[int]:
    """Truncated-Zipf conversation lengths: many short, a few huge."""
    sizes = []
    for _ in range(n_convs):
        # inverse-CDF-ish sampling without numpy for portability
        u = rng.random()
        size = max(1, min(max_turns, int((1.0 / max(u, 1e-9)) ** (1.0 / zipf_a))))
        sizes.append(size)
    return sizes


def generate_rows(
    n_turns: int,
    seed: int = 42,
    skew_conv_turns: int = 0,
) -> tuple[list[dict], list[dict]]:
    """Generate ``n_turns`` transcript rows + golden sidecar rows.

    ``skew_conv_turns`` > 0 prepends one mega-conversation with that
    many turns (the explicit skew fixture).
    """
    rng = random.Random(seed)
    t0 = datetime(2026, 1, 1, tzinfo=timezone.utc)
    rows: list[dict] = []
    goldens: list[dict] = []
    global_turn = 0
    conv_no = 0

    def add_conv(size: int) -> None:
        nonlocal global_turn, conv_no
        conv_id = f"conv-{conv_no:08d}"
        conv_no += 1
        for turn_idx in range(size):
            kind = _KIND_CYCLE[(global_turn + turn_idx) % len(_KIND_CYCLE)]
            payload, golden = _KIND_BUILDERS[kind](rng)
            rows.append(
                {
                    "conv_id": conv_id,
                    "turn_idx": turn_idx,
                    "role": ROLES[turn_idx % 3],
                    "text": payload,
                    "tool": kind,
                    "ts": t0 + timedelta(seconds=global_turn + turn_idx),
                }
            )
            goldens.append(
                {"conv_id": conv_id, "turn_idx": turn_idx, "expected_text": golden}
            )
        global_turn += size

    if skew_conv_turns > 0:
        add_conv(min(skew_conv_turns, n_turns))
    while global_turn < n_turns:
        size = conversation_sizes(1, rng)[0]
        add_conv(min(size, n_turns - global_turn))
    return rows, goldens


def write_parquet(
    out_dir: str,
    n_turns: int,
    seed: int = 42,
    skew_conv_turns: int = 0,
    n_files: int = 1,
) -> tuple[str, str]:
    """Write ``transcripts.parquet`` + ``golden.parquet`` under
    ``out_dir`` (pyarrow direct — no Spark needed at generation time).
    ``n_files > 1`` writes a *directory* of part files instead (the
    realistic many-files layout of a large table). Returns the two
    paths (transcripts path may be a directory)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    import os

    rows, goldens = generate_rows(n_turns, seed, skew_conv_turns)
    os.makedirs(out_dir, exist_ok=True)
    t_path = os.path.join(out_dir, "transcripts.parquet")
    g_path = os.path.join(out_dir, "golden.parquet")
    schema = pa.schema(
        [
            ("conv_id", pa.string()),
            ("turn_idx", pa.int32()),
            ("role", pa.string()),
            ("text", pa.string()),
            ("tool", pa.string()),
            ("ts", pa.timestamp("us", tz="UTC")),
        ]
    )
    table = pa.Table.from_pylist(rows, schema=schema)
    # small row groups: parquet scans parallelize per row group, and
    # extraction is CPU-heavy per byte — 1024-row groups give local[32]
    # plenty of splits without a repartition shuffle
    if n_files <= 1:
        pq.write_table(table, t_path, row_group_size=1024)
    else:
        os.makedirs(t_path, exist_ok=True)
        step = (len(rows) + n_files - 1) // n_files
        for i in range(n_files):
            part = table.slice(i * step, step)
            if part.num_rows:
                pq.write_table(
                    part,
                    os.path.join(t_path, f"part-{i:05d}.parquet"),
                    row_group_size=1024,
                )
    gschema = pa.schema(
        [("conv_id", pa.string()), ("turn_idx", pa.int32()), ("expected_text", pa.string())]
    )
    pq.write_table(pa.Table.from_pylist(goldens, schema=gschema), g_path)
    return t_path, g_path
