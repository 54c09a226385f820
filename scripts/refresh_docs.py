"""Regenerate the performance tables in README.md / COVERAGE.md from an
official ``BENCH_r{N}.json``.

Round-5 verdict: doc-quoted numbers drifted from the official bench (the
builder's end-of-round run vs the driver's recorded run). This script is
the single source of truth — the family table in README.md and the perf
paragraph in COVERAGE.md live between ``refresh-docs:`` marker comments
and are REWRITTEN from the named bench file, never edited by hand.

Usage::

    python scripts/refresh_docs.py            # latest BENCH_r*.json
    python scripts/refresh_docs.py BENCH_r05.json
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Stable family descriptions (workload shapes do not change run to run;
# the numbers do — which is exactly why only the numbers are generated).
FAMILY_DESC = {
    "hll_distinct": "HLL distinct (md5-register math)",
    "asof_join": "as-of join (vs DuckDB's native ASOF)",
    "heavy_hitters": "heavy hitters (top-10/key)",
    "exact_dedup": "exact dedup (normalized md5)",
    "minhash_lsh_600k": "MinHash+LSH banding (600 k docs ≈ 67 M md5)",
    "ann_brute_2m_x128": (
        "ANN brute-force top-k (2 M×16-dim corpus × 128 queries,"
        " 256 M pairs)"
    ),
    "ann_quantized_2m_x128": (
        "quantized ANN (int8 calibrate→quantize→exact-integer top-k,"
        " same 2 M×16-dim shape)"
    ),
    "text_metrics_15m": (
        "text metrics (15 M docs, 120 M tokens: split/distinct/lengths)"
    ),
    "sessionize_60m": "sessionization (1 M users, lag + running-sum window)",
    "pack_manifest_15m": (
        "sequence packing (15 M docs → 8192-token sequences, 256 shards)"
    ),
    "funnel_60m": "3-step ordered funnel (2 M users, chained min-after-gate joins)",
    "kmeans_60m": (
        "k-means (k=8, 2 Lloyd iters, 4-dim; codegen'd distances +"
        " explode-free update)"
    ),
    "bitmap_retention": "bitmap activity + 7-day retention (5 M users)",
    "streaming_windows": "streaming hourly windows (16 files, 4-file batches)",
    "streaming_windows_full_recompute": (
        "batch full recompute of the streaming windows (one-shot scan+groupBy,"
        " 5.86 M groups — documented distributed-plan floor, SCALING.md)"
    ),
    "kmeans_15m_d64": (
        "wide k-means (k=8, 2 Lloyd iters, 15 M×64-dim; Arrow+BLAS route,"
        " fused partition-collapsed summary)"
    ),
    "gram_2m_x64": (
        "Gram matrix (2 M×64 int8 codes, exact-integer XᵀX;"
        " per-batch d×d collapse)"
    ),
    "pctrank_60m": (
        "percentile-rank score normalization (60 M×25 groups;"
        " binned pass + broadcast probe join)"
    ),
    "qnorm_60m": (
        "quantile normalization (60 M×25 groups onto the global"
        " reference; union+window CDF inversion, no range join)"
    ),
    "span_extents_2m": (
        "duplicate-span extents (2 M×24-token docs; 34 M-gram census,"
        " stitched substring dedup; DuckDB mirror MATERIALIZED)"
    ),
    "bm25_15m": (
        "BM25 retrieval scoring (15 M docs / 120 M tokens, 3 queries;"
        " one pruned corpus pass, fixed-point sums)"
    ),
    "ann_pq_2m_x128": (
        "PQ/ADC compressed-domain ANN (encode to 4 sub-codes +"
        " broadcast-LUT scoring, same 2 M×16-dim shape)"
    ),
    "vocab_tok_15m": (
        "greedy vocab tokenization (15 M docs / 120 M words, Arrow bulk"
        " kernel vs recursive-CTE mirror)"
    ),
}


def _load_bench(arg: str | None) -> tuple[str, dict]:
    if arg:
        path = arg if os.path.isabs(arg) else os.path.join(ROOT, arg)
    else:
        cands = sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json")))
        if not cands:
            raise SystemExit("no BENCH_r*.json found")
        path = cands[-1]
    with open(path) as f:
        raw = json.load(f)
    # driver files wrap the bench line under "parsed"; a bare bench.py
    # output line is already the dict. "parsed": null means the driver's
    # capture failed to parse that round's line — not a usable record.
    data = raw.get("parsed", raw)
    if data is None or "spark_families_60m_sec" not in data:
        raise SystemExit(
            f"{os.path.basename(path)} has no parsed bench record"
            " (parsed: null or missing families) — pass an older"
            " BENCH_r*.json or a bare bench.py output file explicitly"
        )
    return os.path.basename(path), data


def _fmt_s(v: float) -> str:
    return f"{v:.1f} s" if v >= 9.95 else f"{v:.2f} s"


def _family_rows(data: dict) -> list[tuple[str, float, float, float]]:
    sp = data["spark_families_60m_sec"]
    dd = data["duckdb_families_60m_sec"]
    rows = []
    for k in sp:
        if k in dd and dd[k] > 0:
            rows.append((k, sp[k], dd[k], sp[k] / dd[k]))
    rows.sort(key=lambda r: r[3])
    return rows


def _families_block(src: str, data: dict) -> str:
    rows = _family_rows(data)
    under = sum(1 for r in rows if r[3] <= 1.25)
    beat = sum(1 for r in rows if r[3] < 1.0)
    lines = [
        f"{'Official' if src.startswith('BENCH_r') else 'Local end-of-round'}"
        f" `{src}` run (regenerate with `python scripts/refresh_docs.py`):",
        "",
        "| family (60 M rows) | Spark | DuckDB | ratio |",
        "|---|---|---|---|",
    ]
    for k, s, d, r in rows:
        desc = FAMILY_DESC.get(k, k)
        lines.append(f"| {desc} | {_fmt_s(s)} | {_fmt_s(d)} | {r:.2f}× |")
    lines += [
        "",
        f"{beat} of {len(rows)} families beat single-node DuckDB outright;"
        f" {under} sit at or under ~1.2×.",
    ]
    return "\n".join(lines)


def _coverage_block(src: str, data: dict) -> str:
    rows = _family_rows(data)
    ratios = ", ".join(f"{k} {r:.2f}×" for k, _, _, r in rows)
    over = [(k, s, d, r) for k, s, d, r in rows if r > 2.0]
    over_txt = (
        "every family under the 2× gate"
        if not over
        else "every family under the 2× gate except "
        + ", ".join(
            f"{k} ({_fmt_s(s)} vs {_fmt_s(d)} ≈ {r:.1f}×,"
            " measured floor in SCALING.md)"
            for k, s, d, r in over
        )
    )
    q = data.get("queries", {})
    return (
        f"{'Official' if src.startswith('BENCH_r') else 'Local end-of-round'} performance numbers (from `{src}`; regenerate with"
        " `python scripts/refresh_docs.py` — do not hand-edit):"
        f" headline {data.get('value')} s over {len(q)} queries"
        f" (DuckDB oracle total"
        f" {data.get('duckdb_oracle_total', sum(data.get('duckdb_oracle', {}).values())):.3f} s);"
        f" native sketch path {data.get('native_sketch_60m_sec')} s at 60 M"
        f" ({data.get('native_sketch_rows_per_sec', 0) / 1e6:.0f} M rows/s)"
        f" vs DuckDB {data.get('duckdb_60m_sec')} s;"
        f" 60 M family ratios (Spark/DuckDB) — {ratios};"
        f" {over_txt}."
    )


def _splice(path: str, tag: str, body: str) -> None:
    begin = f"<!-- refresh-docs:{tag} BEGIN -->"
    end = f"<!-- refresh-docs:{tag} END -->"
    with open(path) as f:
        text = f.read()
    pat = re.compile(
        re.escape(begin) + r".*?" + re.escape(end), flags=re.DOTALL
    )
    if not pat.search(text):
        raise SystemExit(f"{path}: markers refresh-docs:{tag} not found")
    # lambda replacement: re.sub would interpret backslashes / group refs
    # inside the generated body as regex escapes and corrupt the splice
    text = pat.sub(lambda _m: begin + "\n" + body + "\n" + end, text)
    with open(path, "w") as f:
        f.write(text)
    print(f"wrote {tag} block -> {path}")


def main() -> None:
    src, data = _load_bench(sys.argv[1] if len(sys.argv) > 1 else None)
    _splice(os.path.join(ROOT, "README.md"), "families", _families_block(src, data))
    _splice(os.path.join(ROOT, "COVERAGE.md"), "perf", _coverage_block(src, data))


if __name__ == "__main__":
    main()
