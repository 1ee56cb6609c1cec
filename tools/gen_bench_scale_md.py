"""Regenerate BENCH_SCALE.md from the committed bench_scale/*.json
evidence (sf0.1 baseline = BENCH_FULL.json at the repo root).

Inputs (all produced by bench.py with SPARK_GRAFT_SF_DIR /
SPARK_GRAFT_BENCH_OUT):
    BENCH_FULL.json              sf0.1, full registry
    bench_scale/sf1.json         sf1 (10x), full registry
    bench_scale/sf1skew.json     skewed sf1, full registry
    bench_scale/sf1_w10_rep2.json / _rep3.json   (optional) worst-set
        repeats at sf1, serialized, for measurement-variance evidence
    bench_scale/sf10_w10.json    (optional) worst-set at sf10 (100x,
        events/documents/embeddings only)

Usage: python tools/gen_bench_scale_md.py > BENCH_SCALE.md
"""

from __future__ import annotations

import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def load(path: str) -> dict[str, float]:
    p = os.path.join(ROOT, path)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)["queries"]


def load_rows(path: str) -> dict[str, int]:
    """Result-cardinality map (bench.py `rows`, recorded since r7) —
    absent in pre-r7 evidence files, so default to empty."""
    p = os.path.join(ROOT, path)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f).get("rows", {})


def main() -> None:
    import glob

    base = load("BENCH_FULL.json")
    sf1 = load("bench_scale/sf1.json")
    skew = load("bench_scale/sf1skew.json")
    rep2 = load("bench_scale/sf1_w10_rep2.json")
    rep3 = load("bench_scale/sf1_w10_rep3.json")
    sf10 = load("bench_scale/sf10_w10.json")
    # Round-8 targeted re-measurements. The audit reps REPLACE the
    # stale full-registry cells outright (sim_blocked_recall's truth
    # side changed semantics in r8 — code-enforced ≤2000-rep slice —
    # so pre-r8 numbers measure a query that no longer exists; the
    # precision row's old cells predate the AQE-race fix). The
    # variance reps (eval_mrr_at_k / text_unigram_train, semantics
    # unchanged) merge into the min like any other repeat.
    r8_sf1: dict[str, list[float]] = {}
    for p in sorted(glob.glob(os.path.join(ROOT, "bench_scale/r8_var_rep*.json"))) + sorted(
        glob.glob(os.path.join(ROOT, "bench_scale/r8_aud_sf1_rep*.json"))
    ):
        for k, v in load(os.path.relpath(p, ROOT)).items():
            if v > 0:
                r8_sf1.setdefault(k, []).append(v)
    r8_skew: dict[str, list[float]] = {}
    for p in sorted(
        glob.glob(os.path.join(ROOT, "bench_scale/r8_aud_sf1skew_rep*.json"))
    ):
        for k, v in load(os.path.relpath(p, ROOT)).items():
            if v > 0:
                r8_skew.setdefault(k, []).append(v)
    # Round-8 NEW-query evidence: sf0.1 base (min-of-2 in-run passes)
    # plus min across the sf1 / sf1skew repeat files.
    r8n_base = load("bench_scale/r8_new_sf01.json")
    r8n_sf1: dict[str, list[float]] = {}
    r8n_skew: dict[str, list[float]] = {}
    r8n_sf10: dict[str, list[float]] = {}
    for pat, acc in (
        ("bench_scale/r8_new_sf1.json", r8n_sf1),
        ("bench_scale/r8_new_sf1_rep*.json", r8n_sf1),
        ("bench_scale/r8_new_sf1skew.json", r8n_skew),
        ("bench_scale/r8_new_sf1skew_rep*.json", r8n_skew),
        ("bench_scale/r8_new_sf10*.json", r8n_sf10),
    ):
        for p in sorted(glob.glob(os.path.join(ROOT, pat))):
            for k, v in load(os.path.relpath(p, ROOT)).items():
                if v > 0:
                    acc.setdefault(k, []).append(v)
    AUDIT_REPLACED = {"sim_blocked_recall", "sim_blocked_precision"}
    for k in AUDIT_REPLACED:
        if k in r8_sf1 and k in sf1:
            sf1[k] = min(r8_sf1[k])
        if k in r8_skew and k in skew:
            skew[k] = min(r8_skew[k])
    sf1_rows = {}
    for p in ("bench_scale/sf1.json", "bench_scale/sf1_w10_rep2.json",
              "bench_scale/sf1_w10_rep3.json"):
        sf1_rows.update(load_rows(p))
    sf10_rows = load_rows("bench_scale/sf10_w10.json")
    common = sorted(set(base) & set(sf1) & set(skew))
    t0 = sum(v for k, v in base.items() if k in common and v > 0)
    t1 = sum(v for k, v in sf1.items() if k in common and v > 0)
    ts = sum(v for k, v in skew.items() if k in common and v > 0)

    def sf1_min(k: str) -> float:
        """Best across the full-registry run and the dedicated repeats
        — the same min-of-passes philosophy bench.py applies within a
        run, extended across runs (heavy rows on this shared box show
        up to ~4× ambient spread; min is the engine cost)."""
        if k in AUDIT_REPLACED:
            return sf1.get(k, -1.0)  # r8 reps only; pre-r8 cells stale
        # Round 8 changed bench semantics (cache cleared between
        # queries — each query pays its own cache population), so the
        # ratio numerator uses the NEW-semantics full-registry run
        # plus the new-semantics r8 repeat files ONLY; the round-7
        # worst-set reps (old semantics: later passes free-rode on
        # earlier passes' persisted state) remain displayed as
        # historical variance but no longer pull the min down.
        vals = [v for v in (sf1.get(k),) if v is not None and v > 0]
        vals += r8_sf1.get(k, [])
        return min(vals) if vals else -1.0

    rows = []
    for k in common:
        b, s1, sk = base[k], sf1_min(k), skew[k]
        if b >= 0.3 and s1 > 0:
            rows.append((s1 / b, k, b, s1, sk))
    rows.sort(reverse=True)

    skews = []
    for k in common:
        s1, sk = sf1[k], skew[k]
        if s1 >= 1.0 and sk / s1 >= 1.5:
            skews.append((sk / s1, k, s1, sk))
    skews.sort(reverse=True)

    out = []
    out.append(
        "# BENCH_SCALE — measured sf0.1 → sf1 (10×) scaling,"
        " skewed sf1, repeat variance, and an sf10 (100×) spot-bench\n"
    )
    out.append(
        "Generated by `tools/gen_bench_scale_md.py` from"
        " `tools/gen_scale.py` stress data (`stress_data/sf1`,"
        " `stress_data/sf1skew`, `stress_data/sf10`;\ngitignored —"
        " regenerate with `tools/run_scale_campaign.sh`). `sf1skew`"
        " plants a hot user key"
        " (20% of events) and a ~10k-copy\nduplicate document cluster"
        " to stress the skew paths. `sf10` (100× sf0.1) carries ALL"
        " fact tables\n(round 7 — orders/lineitem included, so the"
        " second decade now covers graph_triangle_count and\n"
        "eval_bootstrap_ci too). The sf10 worst-set run omits exactly"
        " one row by contract: `sim_allpairs_prefix`,\nthe"
        " exact-by-contract Σdf² diagnostic, measured once in round 6"
        " at 2674s (90×/decade — the documented\nquadratic wall; its"
        " bounded production sibling `sim_allpairs_blocked` IS in the"
        " set). Raw per-query maps:\n`bench_scale/*.json`.\n\n"
        "SEMANTICS NOTE (round 8): bench.py now clears the Spark"
        " cache between queries, so each query pays its OWN cache"
        " population — the old accumulate-everything sessions let"
        " later passes free-ride on earlier passes' persisted state"
        " and, worse, let a cache-heavy batch thrash later queries at"
        " sf≥1 (measured 5.6s vs 140s for the same plan). Totals are"
        " therefore NOT comparable across the change (sf0.1 full"
        " registry: 243s warm-accounting → 380s honest-cold); the"
        " sf0.1 / sf1 / sf1skew full-registry files and every r8_*"
        " evidence file are new-semantics, while the round-7"
        " worst-set reps and the sf10 worst-set spot-bench remain"
        " old-semantics and are marked where shown.\n"
    )
    out.append(
        f"- Full-registry totals over {len(common)} queries:"
        f" sf0.1 = {t0:.0f}s, sf1 = {t1:.0f}s, sf1skew = {ts:.0f}s."
    )
    out.append(
        f"- Aggregate scaling: 10× the data → {t1 / t0:.2f}× total"
        " wall-clock (sublinear — fixed per-query overheads amortize;"
        " no systemic blow-up)."
    )
    out.append(
        f"- Skew delta: sf1skew/sf1 = {ts / t1:.2f}× — banded interval"
        " joins, salted aggregations, population-capped LSH buckets"
        " and exact-collapse-before-LSH/all-pairs keep hot keys"
        " bounded.\n"
    )
    if ts / t1 < 1.0:
        out.append(
            "  (A skew total BELOW the uniform sf1 total means the"
            " uniform full-registry run caught ambient load on a few"
            " heavy rows — see the variance table; the per-query skew"
            " deltas below are the real signal.)\n"
        )
    else:
        out.append(
            "  (The skew run is SINGLE-pass — min-of-2 is only applied"
            " to the uniform sf1 anchor — so its total carries one"
            " run's ambient spread on a shared box plus the"
            " audit/session rows whose skew cost is output-bound or"
            " hot-key-linear BY DESIGN; the per-query deltas below,"
            " each with a written explanation in Reading the tables,"
            " are the real signal.)\n"
        )
    out.append(
        "## Worst scaling ratios (sf1 / sf0.1, queries ≥0.3s at"
        " sf0.1)\n"
    )
    out.append(
        "Rows WITHOUT dedicated repeats that show sf1 ≫ sf1skew on"
        " same-sized data (e.g. a 13× row with a 4× skew sibling) are"
        " ambient-load artifacts of the shared box, not plan"
        " behavior — the variance table below quantifies exactly that"
        " spread for the worst set.\n"
    )
    have_rep = bool(rep2 and rep3)
    have_10 = bool(sf10)
    hdr = "| query | sf0.1 s | sf1 s | sf1skew s | ratio |"
    sep = "|---|---|---|---|---|"
    if have_rep:
        hdr += " sf1 rep2/rep3 |"
        sep += "---|"
    if have_10:
        hdr += " sf10 s | sf10/sf1 |"
        sep += "---|---|"
    hdr = hdr.replace("| sf1 s |", "| sf1 s (min of runs) |")
    out.append(hdr)
    out.append(sep)
    for r, k, b, s1, sk in rows[:14]:
        line = f"| {k} | {b:.2f} | {s1:.2f} | {sk:.2f} | {r:.1f}× |"
        if have_rep:
            if k in rep2 and k in rep3:
                line += f" {rep2[k]:.2f} / {rep3[k]:.2f} |"
            else:
                line += " — |"
        if have_10:
            if sf10.get(k, -1) > 0:
                line += f" {sf10[k]:.2f} | {sf10[k] / s1:.1f}× |"
            else:
                line += " — | — |"
        out.append(line)
    out.append("")
    if have_rep:
        worst = {k for _, k, *_ in rows[:14]}
        spread = []
        for k in sorted(set(rep2) & set(rep3) | set(r8_sf1)):
            if k in r8_sf1 and len(r8_sf1[k]) >= 2:
                # r8 serialized reps supersede earlier mixed-run
                # spreads for the queries they cover (the two former
                # >5× variance rows and the two re-shaped audits).
                vals = r8_sf1[k]
            elif k in rep2 and k in rep3:
                vals = [v for v in (sf1.get(k), rep2[k], rep3[k])
                        if v and v > 0]
            else:
                continue
            if len(vals) >= 2 and min(vals) > 0:
                spread.append(
                    (max(vals) / min(vals), k, vals, k in r8_sf1)
                )
        spread.sort(reverse=True)
        out.append(
            "### Measurement variance (three serialized sf1 runs of"
            " the worst set)\n"
        )
        out.append(
            "max/min wall-clock ratio across the full-registry run"
            " and two dedicated repeats —"
            " ≤1.5× means the scaling ratios above are real, not"
            " ambient load. Rows marked (r8 serialized) are round-8"
            " dedicated 3-repeat sets on a quiet box; they close the"
            " two >5× rows round 7 left open (`eval_mrr_at_k`"
            " 5.41× → 1.07×, `text_unigram_train` 5.43× → 1.04× —"
            " ambient load, as the plan shapes predicted):\n"
        )
        out.append("| query | runs (s) | max/min |")
        out.append("|---|---|---|")
        for r, k, vals, is_r8 in spread:
            mark = " (r8 serialized)" if is_r8 else (
                "" if k in worst else " (extra)"
            )
            out.append(
                f"| {k}{mark} | "
                + " / ".join(f"{v:.2f}" for v in vals)
                + f" | {r:.2f}× |"
            )
        out.append("")
    if r8n_base and r8n_sf1:
        out.append("### Round-8 new-query scale evidence (sf0.1 → sf1, skewed sf1)\n")
        out.append(
            "Dedicated runs for the queries added in round 8 (absent"
            " from the round-7 full-registry files): sf0.1 is"
            " min-of-2 in-run passes; sf1 / sf1skew / sf10 are min"
            " across serialized repeat runs (single-pass each) under"
            " the cache-clearing bench. The second decade (sf10,"
            " 100× sf0.1) includes the two blocking audits —"
            " `sim_blocked_recall`'s 1.9×/decade is the code-enforced"
            " slice bound doing exactly what it was added for."
            " Superlinear second-decade rows are explained in Reading"
            " the tables.\n"
        )
        out.append(
            "| query | sf0.1 s | sf1 s (min) | ratio |"
            " sf1skew s (min) | skew/sf1 | sf10 s | sf10/sf1 |"
        )
        out.append("|---|---|---|---|---|---|---|---|")
        nrows = []
        for k in sorted(set(r8n_base) | set(r8n_sf10)):
            b = r8n_base.get(k, base.get(k, -1))
            s1_vals = r8n_sf1.get(k, []) + r8_sf1.get(k, [])
            s1v = min(s1_vals) if s1_vals else -1
            skv = min(r8n_skew[k]) if k in r8n_skew else (
                min(r8_skew[k]) if k in r8_skew else -1
            )
            s10v = min(r8n_sf10[k]) if k in r8n_sf10 else -1
            if s1v > 0:
                nrows.append((s1v / b if b > 0 else 0, k, b, s1v, skv, s10v))
        nrows.sort(reverse=True)
        for r, k, b, s1v, skv, s10v in nrows:
            b_cell = f"{b:.2f}" if b > 0 else "—"
            r_cell = f"{r:.1f}×" if b > 0 else "—"
            sk_cell = f"{skv:.2f}" if skv > 0 else "—"
            sk_ratio = f"{skv / s1v:.1f}×" if skv > 0 else "—"
            s10_cell = f"{s10v:.2f}" if s10v > 0 else "—"
            s10_ratio = f"{s10v / s1v:.1f}×" if s10v > 0 else "—"
            out.append(
                f"| {k} | {b_cell} | {s1v:.2f} | {r_cell} |"
                f" {sk_cell} | {sk_ratio} | {s10_cell} | {s10_ratio} |"
            )
        out.append("")
    if sf10_rows:
        ob = []
        for k in sorted(sf10_rows):
            r1, r10 = sf1_rows.get(k, -1), sf10_rows.get(k, -1)
            s1, s10 = sf1_min(k), sf10.get(k, -1.0)
            if r1 > 0 and r10 > 0 and s1 > 0 and s10 > 0:
                ob.append((k, r1, s1, r10, s10))
        if ob:
            out.append(
                "### Output cardinality across decades (rows emitted"
                " beside wall-clock)\n"
            )
            out.append(
                "Separates OUTPUT-bound growth from per-row cost"
                " growth: when the result-row count itself grows"
                " superlinearly (the fixed-vocabulary synthetic corpus"
                " densifies — true near-dup pairs multiply), flat-ish"
                " rows/sec across decades means per-row engine work is"
                " bounded and the wall-clock ratio is the DATA's"
                " densification, not a plan defect. Rows/sec is only"
                " meaningful for output-dominated queries (pair"
                " emitters); scalar-output rows are listed for"
                " completeness.\n"
            )
            out.append(
                "| query | sf1 rows | sf1 s | sf1 rows/s |"
                " sf10 rows | sf10 s | sf10 rows/s | rows ×"
                " | rows/s ratio |"
            )
            out.append("|---|---|---|---|---|---|---|---|---|")
            for k, r1, s1, r10, s10 in ob:
                rps1, rps10 = r1 / s1, r10 / s10
                out.append(
                    f"| {k} | {r1} | {s1:.2f} | {rps1:.0f} |"
                    f" {r10} | {s10:.2f} | {rps10:.0f} |"
                    f" {r10 / r1:.1f}× | {rps10 / rps1:.2f}× |"
                )
            out.append("")
    out.append("## Largest skew deltas (sf1skew / sf1, queries ≥1s at sf1)\n")
    if skews:
        out.append("| query | sf1 s | sf1skew s | ratio |")
        out.append("|---|---|---|---|")
        for r, k, s1, sk in skews[:10]:
            out.append(f"| {k} | {s1:.2f} | {sk:.2f} | {r:.1f}× |")
    else:
        out.append(
            "None ≥1.5× — the planted hot user and duplicate cluster"
            " do not super-linearize any query."
        )
    out.append("")
    out.append("## Reading the tables\n")
    out.append(
        "- `sim_allpairs_prefix` is the inherent exact all-pairs"
        " bound: candidate volume is Σ_{prefix grams} df², and df per"
        " gram grows LINEARLY with the corpus — the operator is"
        " quadratic per decade BY CONTRACT. Round 6's ppjoin"
        " positional filter (on top of t = 1/√2 rarest-half prefixes"
        " and exact-collapse) cuts the constant (sf1 53.8s → ~29s);"
        " the sf10 run then shows the quadratic wall exactly where"
        " the bound predicts (~90× per decade at 100×). That is the"
        " documented trade: EXACT similarity does Σdf² work; SCALE.md"
        " names minhash LSH as the approximate production path at web"
        " scale, with all-pairs reserved for blocked subsets."
    )
    out.append(
        "- `dedup_minhash_lsh` / `sim_embedding_neardup` at sf10 are"
        " OUTPUT-bound, not compute-bound: the fixed-vocabulary"
        " synthetic corpus densifies at scale (near-duplicate pair"
        " COUNT grows superlinearly — ~10M result rows at sf10), so"
        " wall-clock tracks rows emitted; per-candidate work stays"
        " bounded by the band/bucket caps."
    )
    out.append(
        "- `graph_triangle_count` is the O(m^1.5) degree-oriented"
        " wedge join — theory-optimal for exact triangle counting."
        " With the full sf10 fact tables (round 7) its second decade"
        " is now MEASURED: 12.5×/decade against the m^1.5 bound of"
        " ~31.6× — comfortably sublinear in the bound."
        " `eval_bootstrap_ci` likewise measures 5.2×/decade on the"
        " 60M-row sf10 lineitem — the linear replicate ladder."
    )
    out.append(
        "- `sim_allpairs_blocked` at sf10 is CANDIDATE-bound, the"
        " designed trade: band-collision volume tracks the corpus'"
        " true near-dup density, which in this densifying synthetic"
        " corpus grows ~97× per decade (see `dedup_minhash_lsh` rows"
        " emitted). Wall grew only 23.7× — per-candidate work FELL,"
        " and the row sits far under the unblocked exact join's"
        " measured 90×/decade. On a real web corpus (near-dup density"
        " roughly flat per document) the same plan is ~linear."
    )
    out.append(
        "- `graph_bfs_hops` second decade: 15.7×/decade with output"
        " exactly 10× — the ~1.6× superlinear remainder is frontier"
        " densification (hop-2/3 frontiers cover most of the graph"
        " sooner in a denser co-occurrence graph), not a plan change;"
        " the sf1 evidence (2.1× at 10×, min of 3 runs) pins the"
        " plan itself as ~linear."
    )
    out.append(
        "- Large SKEW deltas on the single-pass skew run are"
        " explained per-query:"
        " `select_mmr_diverse`/`select_dsir_importance` score the"
        " duplicate cluster's inflated candidate pool;"
        " sessionization rows (`w1_*`, `w8_recursive_split`) carry"
        " the documented hot-user exposure (one user owns 20% of"
        " events — per-key kernels are linear in key size);"
        " `json_props_extract` is map-only and its delta is"
        " single-pass ambient, not skew (its uniform repeats span"
        " 2.3-3.4s)."
    )
    out.append(
        "- `embed_mutual_knn` / `mine_hard_negatives` /"
        " `sim_embedding_neardup` now run through the"
        " population-capped LSH bucketing (cap=256: count-once"
        " escalation + salt shards), so per-kernel work is O(cap²)"
        " at any corpus size — the round-5 fixed-plane quadratic is"
        " gone (sf1 17.0 → ~8s for mutual-kNN)."
    )
    out.append(
        "- `dedup_minhash_lsh` now gates the exact-collapsed"
        " composition and stays flat under the duplicate-cluster"
        " skew; the quadratic raw pair list survives only as the"
        " diagnostic-only `dedup_minhash_lsh_uncollapsed` row, whose"
        " cost under the ~10k-copy cluster is the documented"
        " contract. Interval/sweepline deltas (~2-3×) are the"
        " documented hot-user exposure: banded attribution bounds"
        " them to density×band, never key²."
    )
    out.append(
        "- `sim_blocked_recall` / `sim_blocked_precision`: round 7"
        " surfaced and fixed an AQE cache-population race (two count"
        " branches re-running the quadratic exact side —"
        " 25s/102s/283s spread → single-action shape); round 8 then"
        " moved the recall audit's quadratic truth side from a"
        " docstring contract to CODE — the exact join runs on an"
        " id-bounded ≤2000-representative slice"
        " (queries/text_q.py _BLK_RECALL_MOD/_BLK_RECALL_CAP, the"
        " sim_knn_recall_audit anchor-cap pattern), so the audit is"
        " ≤cap² at every scale, and rewrote the precision audit to"
        " evaluate its candidate chain ONCE. Every cell for these two"
        " rows is a round-8 min-of-3 serialized measurement of the"
        " SHIPPED shapes (pre-r8 cells measured shapes that no longer"
        " exist): recall sf1 "
        + "/".join(f"{v:.2f}" for v in sorted(r8_sf1.get("sim_blocked_recall", [])))
        + "s, sf1skew "
        + "/".join(f"{v:.2f}" for v in sorted(r8_skew.get("sim_blocked_recall", [])))
        + "s — the former 131.96s skew cell was the UNSLICED truth"
        " side on the planted ~10k-duplicate corpus, exactly the"
        " 100 TB trap the code bound now prevents; precision sf1 "
        + "/".join(f"{v:.2f}" for v in sorted(r8_sf1.get("sim_blocked_precision", [])))
        + "s, sf1skew "
        + "/".join(f"{v:.2f}" for v in sorted(r8_skew.get("sim_blocked_precision", [])))
        + "s (no quadratic side by design — full-corpus safe,"
        " unchanged semantics)."
    )
    out.append(
        "- Round-8 new-query rows: with min-of-reps on a quiet box,"
        " every addition is sublinear per decade (worst 5.2×/10× —"
        " RAKE, whose distinct-phrase table grows with the corpus"
        " until phrase vocabulary saturates) and skew-flat (≤1.2×):"
        " the duplicate cluster costs `dedup_containment`/`"
        "dedup_source_matrix` one collapsed representative, and"
        " `graph_adamic_adar`'s hub cap bounds the densified"
        " co-purchase wedges. Single-pass cells measured during"
        " ambient load had shown up to 5× inflation on exactly these"
        " rows (e.g. QL 34.5s → 6.1s); the repeat protocol is what"
        " makes these numbers quotable — same lesson as round 6's"
        " BFS case."
    )
    out.append(
        "- Round-8 second decade (sf10): `sim_cosine_histogram`'s"
        " exhaustive form measured 47.7×/decade — CANDIDATE-bound"
        " (it scores EVERY band-collision pair with no threshold or"
        " size prune while candidates grow ~97×/decade on this"
        " densifying corpus; per-candidate work FELL ~2×). Since a"
        " distribution PROFILE loses nothing statistical to a"
        " deterministic sample, the gate row now runs on a"
        " code-enforced ≤20000-rep slice (the sim_blocked_recall"
        " pattern; `slice_mod=None` recovers the exhaustive"
        " diagnostic), and the table shows the sliced row's"
        " measurements. `graph_adamic_adar` 12.0×/decade is"
        " EDGE-bound: the part co-purchase graph itself densifies"
        " (the same growth graph_triangle_count measures at"
        " 12.5×/decade) and the hub cap keeps work ≤cap·m — linear"
        " in the grown edge set. `search_query_likelihood` measures"
        " 11.6×/decade (solo rep) — linear in corpus chars within"
        " ambient noise, like its BM25 sibling. `sim_blocked_recall`"
        " at 1.9×/decade is the headline: the sliced truth side is"
        " CONSTANT work, so only the corpus-side band pass grows."
    )
    out.append("")
    print("\n".join(out))


if __name__ == "__main__":
    main()
