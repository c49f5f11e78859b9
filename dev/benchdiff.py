#!/usr/bin/env python3
"""Probe-normalized bench regression check, window-aware edition.

Usage: dev/benchdiff.py <baseline.json> <candidate.json> [threshold]
       dev/benchdiff.py --selftest

Both files are graft.Bench JSON lines -- either the bare object the
Bench main writes (target/bench_full.json) or the driver's BENCH_r{N}
wrapper (the bare object then lives under "parsed").

Normalization (r12 lesson): the host-speed ratio between the two runs
is estimated from the MEDIAN of the position-matched in-run scan-probe
ratios whenever the timelines align (same order, >=3 matched
positions) and show no sustained hot stretch -- those probes ran
INSIDE the query window and measure the host the queries actually
saw. The single START-of-run probe_sec is one cold sample: in r12 it
diverged 12% from the in-run reality (1.034 vs 0.920 across rounds
while the in-run medians sat at parity) and manufactured a suite-wide
1.18x FAIL out of a 1.037x raw movement on byte-untouched code.
Individual in-run probes still wobble up to 2x (each inherits the
preceding queries' GC/cache state -- the r11 measurement), which is
why the estimator is a MEDIAN over >=3 positions, never a per-query
nearest-probe division, and why a timeline that itself shows a host
window (a contiguous elevated stretch) is rejected as a normalization
source (a partial window would absorb into the median and skew every
query outside it). When the two estimators disagree by >10% both are
printed. The timeline's other job is unchanged: comparing the probe
at the SAME position across the two runs localizes a host window,
which turns "the suite moved, was it host or code?" from a re-run
into a read.

Flagging discipline (the r10 adjudication baked in -- six phantom
>1.3x flags came from a mid-run host window a clean start probe never
saw):
  * If the suite-wide MEDIAN normalized ratio is displaced beyond
    +/-10%, no per-query flag is trustworthy. The position-matched
    probe timeline then adjudicates: a visible host window (or no
    alignable timeline) -> INCONCLUSIVE, exit 0; timelines that align
    CLEANLY while the median is slow -> the displacement is not
    environmental, FAIL exit 1 (a slowdown spread across every query
    -- a shared helper, a config -- is still a regression).
  * Otherwise a query flags only if it exceeds the threshold BOTH
    absolutely and relative to the median (a genuine regression
    leaves the median at ~1.0, so this costs real flags nothing).

Exit 1 only on such CONCENTRATED movement: normalized ratio >
threshold (default 1.3x), ratio/median > threshold, and > 0.2s
absolute. New/removed queries are listed, never failed on.

Harness-change awareness (the r13 lesson): round 13's Bench change
(synchronous broadcast-block drop between queries) made every in-run
probe inherit a CLEAN block manager where r12's inherited ~100 MB of
residue -- the scan-probe timeline ratio (0.75x) measured the harness
improvement, not host speed, while the mem-probe timeline read
0.92-0.96x, and trusting the contaminated one manufactured a 1.27x
suite-wide FAIL out of a 0.948 raw median on byte-untouched code.
Two defenses, layered:
  * The two IN-RUN probe families are independent host estimators;
    when their timeline-median ratios disagree by >10%, NEITHER is a
    trustworthy normalizer -- a suite-wide displacement is then
    INCONCLUSIVE, never FAIL (concentrated single-query flags, which
    are robust to +/-10% normalization, still fire).
  * Bench stamps "bench_semantics" in its JSON (bumped whenever a
    harness change alters what in-run probes inherit). Two stamped
    files with different versions compare RAW-ONLY: ratios are
    reported, suite verdicts are INCONCLUSIVE, nothing FAILs. A
    stamped-vs-unstamped pair (files from before the stamp existed)
    warns and falls through to the estimator-disagreement rule --
    the r12/r13 boundary is pre-adjudicated in BASELINE.md.
"""
import sys, json


def load(path):
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d and isinstance(d["parsed"], dict):
        d = d["parsed"]
    if "queries" not in d:
        sys.exit(f"{path}: no 'queries' key (not a bench JSON?)")
    # the driver's BENCH_r{N} wrapper abbreviates names to the qNN id;
    # local bench output keeps full names -- canonicalize on the id
    d["queries"] = {q.split("_")[0]: t for q, t in d["queries"].items()}
    return d


def matched_pairs(base, cand, key):
    """Position-matched (position, base_sec, cand_sec) probe triples
    for one family. Pairing key is (position, occurrence-index): the
    k-th probe at position P in one run pairs with the k-th probe at
    position P in the other -- identical to index-wise pairing when
    both runs emitted the same probe schedule, and still able to pair
    the shared positions (pass starts/ends) when one run's SHORT line
    was trimmed to starts/ends only (r13: the driver's 2000-byte tail
    window forces the trim as the suite grows). Candidate order is
    preserved so window detection sees a timeline."""
    def occ_keyed(seq):
        seen, out = {}, []
        for p, s in seq:
            k = (p, seen.get(p, 0))
            seen[p] = seen.get(p, 0) + 1
            out.append((k, p, s))
        return out
    bmap = {k: s for k, _, s in occ_keyed(base.get(key) or [])}
    return [(p, bmap[k], s) for k, p, s in occ_keyed(cand.get(key) or [])
            if k in bmap and bmap[k] > 0]


def matched_ratios(base, cand, key):
    """Position-matched cand/base probe ratios for one family."""
    return [(p, c / b) for p, b, c in matched_pairs(base, cand, key)]


def median(vals):
    return sorted(vals)[len(vals) // 2]


def timelines_comparable(base, cand, out):
    """Whether the two runs' probe TIMELINES sit after comparable
    query prefixes at matched positions. Different shuffle seeds, or
    the same seed at different suite sizes (the permutation of a
    different-length list diverges wholly -- r12 lesson), are NOT
    comparable. Alphabetical runs at different suite sizes keep only
    APPROXIMATE prefix alignment (position 25 sits after a different
    prefix once new names sort into it) -- comparable, with a
    warning."""
    sb, sc = base.get("shuffle_seed"), cand.get("shuffle_seed")
    if sb != sc:
        out(f"shuffle seeds differ (base={sb} cand={sc}) "
            "-- probe positions sit after different query prefixes, "
            "timelines are not position-comparable")
        return False
    if sb is not None and len(base["queries"]) != len(cand["queries"]):
        out(f"same shuffle seed but different suite sizes "
            f"({len(base['queries'])} vs {len(cand['queries'])} queries) "
            "-- shuffled orders diverge, timelines are not "
            "position-comparable")
        return False
    if sb is None and len(base["queries"]) != len(cand["queries"]):
        out(f"WARNING: alphabetical runs at different suite sizes "
            f"({len(base['queries'])} vs {len(cand['queries'])} queries) "
            "-- a probe at position N sits after a different query "
            "prefix in each run; position-matched evidence is "
            "approximate")
    return True


def host_speed_ratio(base, cand, out):
    """cand-host-speed / base-host-speed, plus a one-line provenance
    string. Primary estimator: median of the position-matched in-run
    scan-probe ratios (>=3 matched positions, timelines comparable,
    no sustained hot stretch in the scan family). Fallback: the
    start probe_sec ratio."""
    start = (float(cand.get("probe_sec") or 1.0) /
             float(base.get("probe_sec") or 1.0))
    if not timelines_comparable(base, cand, out):
        return start, "start probe (timelines not position-comparable)"
    pairs = matched_pairs(base, cand, "probes")
    if len(pairs) < 3:
        return start, "start probe (<3 matched timeline positions)"
    # a sustained hot OR cold stretch means the in-run probes measured
    # a host WINDOW (in the candidate or the base run respectively),
    # not a steady host speed -- a partial window would absorb into
    # the median and mis-normalize every query outside it; let the
    # window diagnosis (probe_windows) adjudicate instead. The check
    # is symmetric: two consecutive ratios well below 1 mean the BASE
    # run sat in a window, an equally invalid steady-speed source.
    ratios = [c / b for _, b, c in pairs]
    if any(ratios[i] > 1.25 and ratios[i + 1] > 1.25
           for i in range(len(ratios) - 1)):
        return start, ("start probe (in-run timeline shows a hot "
                       "stretch -- not a steady host-speed source)")
    if any(ratios[i] < 0.8 and ratios[i + 1] < 0.8
           for i in range(len(ratios) - 1)):
        return start, ("start probe (in-run timeline shows a sustained "
                       "cold stretch -- the base run sat in a host "
                       "window; not a steady host-speed source)")
    # ratio of MEDIANS (each run's own in-run probe median), not the
    # median of per-position ratios: individual positions wobble up to
    # 2x independently in each run, and the per-run median is the
    # stable summary of "how fast was this host during the queries"
    # (it also stays meaningful when cross-size alphabetical runs make
    # the per-position pairing approximate)
    tl = median([c for _, _, c in pairs]) / median([b for _, b, _ in pairs])
    if abs(tl / start - 1) > 0.10:
        out(f"host-speed estimators disagree >10%: in-run timeline "
            f"medians ratio {tl:.3f}x over {len(pairs)} matched positions "
            f"vs start probe {start:.3f}x -- trusting the timeline (it "
            f"measured the host DURING the queries; the start probe "
            f"is one cold sample)")
    return tl, (f"in-run timeline medians ratio over {len(pairs)} "
                f"matched positions")


def family_median_ratio(base, cand, key):
    """Timeline-median ratio for one probe family (no stretch guard:
    for DISAGREEMENT detection the contaminated family's median is the
    evidence -- host_speed_ratio applies its own guards before using a
    family as a normalizer). None when <3 matched positions."""
    pairs = matched_pairs(base, cand, key)
    if len(pairs) < 3:
        return None
    return median([c for _, _, c in pairs]) / median([b for _, b, _ in pairs])


def estimators_disagree(base, cand, out):
    """True when the two IN-RUN probe families (scan-shaped and
    memory-shaped) give host-speed estimates >10% apart -- the r13
    signature of a harness change contaminating one family (the
    broadcast-drop cleaned what the scan probe inherits; the mem
    probe kept reading 0.92-0.96x while the scan read 0.75x). With
    no agreed-on host speed, a suite-wide displacement cannot be
    attributed to code: INCONCLUSIVE, never FAIL."""
    quiet = lambda *a, **k: None
    if not timelines_comparable(base, cand, quiet):
        return False
    scan = family_median_ratio(base, cand, "probes")
    mem = family_median_ratio(base, cand, "mem_probes")
    if scan is None or mem is None:
        return False
    if abs(scan / mem - 1) > 0.10:
        out(f"in-run host estimators DISAGREE >10%: scan-probe timeline "
            f"{scan:.3f}x vs mem-probe timeline {mem:.3f}x -- no "
            f"trustworthy normalizer exists (one family is measuring a "
            f"harness/state change, not the host)")
        return True
    return False


def semantics_mismatch(base, cand, out):
    """None = comparable. 'raw-only' = both files carry a
    bench_semantics stamp and the stamps differ: the in-run probes of
    the two runs inherited different harness state by construction,
    so normalized comparison is invalid -- report raw ratios only,
    suite verdicts INCONCLUSIVE. A stamped-vs-unstamped pair (one file
    predates the stamp) warns and falls through to the
    estimator-disagreement rule."""
    sb, sc = base.get("bench_semantics"), cand.get("bench_semantics")
    if sb == sc:
        return None
    if sb is not None and sc is not None:
        out(f"bench_semantics differ (base={sb} cand={sc}) -- the two "
            "runs' in-run probes inherited different harness state; "
            "normalized comparison is invalid, reporting RAW ratios only")
        return "raw-only"
    out(f"WARNING: one file is missing a bench_semantics stamp "
        f"(base={sb} cand={sc}) -- it predates the stamp; if the "
        "harness changed between these runs the estimator-disagreement "
        "rule adjudicates (the r12/r13 boundary is pre-adjudicated in "
        "BASELINE.md)")
    return "unstamped"


def one_probe_family(base, cand, key, label, out):
    """Position-matched probe-ratio diagnosis for ONE probe family;
    True if a host window is visible. Returns None when the two
    timelines cannot be aligned (legacy file without this family, a
    suite-size change moved the emission positions, or the two runs
    used different shuffle orders) — "no evidence" is distinct from
    "evidence of no window"."""
    # pair index-wise but REQUIRE the recorded positions to agree —
    # adding/removing queries shifts the pass-end emission position,
    # and comparing a mid-pass probe against a pass-end probe would let
    # the documented 2x within-run wobble fabricate (or hide) a window.
    # Index-wise pairing keeps the shared positions (0, 25, 50, ...)
    # aligned across a suite-size change and simply skips the moved
    # pass-end probes.
    ratios = matched_ratios(base, cand, key)
    if len(ratios) < 3:
        return None
    out(f"{label} timeline (cand/base at matched positions): "
        + "  ".join(f"@{p}:{r:.2f}x" for p, r in ratios))
    # a window = >=2 consecutive positions elevated >=1.25x (single
    # elevated probes are the measured within-run wobble)
    hot = [i for i in range(len(ratios) - 1)
           if ratios[i][1] > 1.25 and ratios[i + 1][1] > 1.25]
    if hot:
        spans = ", ".join(f"positions {ratios[i][0]}..{ratios[i+1][0]}" for i in hot)
        out(f"{label} timeline shows a sustained hot stretch ({spans}) -- "
            "consistent with a HOST window, not a code change")
        return True
    return False


def probe_windows(base, cand, out):
    """Both probe families (scan-shaped "probes", memory-shaped
    "mem_probes" — the Expand-sensitive dimension the scan probe cannot
    see, the r11 q48 adjudication): a window in EITHER is a window;
    None only when NO family is alignable. Runs from different
    shuffled orders never position-match (a probe at position 25 sat
    after different queries in each run)."""
    if not timelines_comparable(base, cand, out):
        return None
    results = [one_probe_family(base, cand, "probes", "scan probe", out),
               one_probe_family(base, cand, "mem_probes", "mem probe", out)]
    if any(r is True for r in results):
        return True
    if all(r is None for r in results):
        return None
    return False


def diff(base, cand, threshold, out=print):
    pb = float(base.get("probe_sec") or 1.0)
    pc = float(cand.get("probe_sec") or 1.0)
    bq, cq = base["queries"], cand["queries"]
    sem = semantics_mismatch(base, cand, out)
    if sem == "raw-only":
        h, src = 1.0, "RAW (bench_semantics differ -- no normalization)"
    else:
        h, src = host_speed_ratio(base, cand, out)
    out(f"start probes: base {pb:.3f}s  cand {pc:.3f}s  (ratio {pc / pb:.2f}x)")
    # r15: graft.Bench self-labels a hot/cold window against the record
    # lineage median -- surface the stamp loudly if either side carries it
    for name, rec in (("base", base), ("cand", cand)):
        ws = rec.get("window_suspect")
        if ws:
            out(f"WINDOW-SUSPECT ({name}): run self-labeled displaced "
                f"{ws} vs its record-lineage median -- treat as suspect")
    out(f"host speed ratio used: {h:.3f}x -- {src}")
    out(f"total: base {base.get('value', '?')}s  cand {cand.get('value', '?')}s")
    rows = []
    for q in sorted(set(bq) & set(cq)):
        # nc = candidate seconds RESCALED to the base run's host speed;
        # nb stays the raw base seconds, so (nc - nb) is an absolute
        # seconds delta and ratio is the host-corrected movement
        nb, nc = bq[q], cq[q] / h
        ratio = nc / nb if nb > 0 else float("inf")
        rows.append((ratio, q, bq[q], cq[q], nb, nc))
    med = sorted(r[0] for r in rows)[len(rows) // 2] if rows else 1.0
    regressions = [(ratio, q) for ratio, q, b, c, nb, nc in rows
                   if ratio > threshold and ratio / med > threshold
                   and nc - nb > 0.2]

    rows.sort(reverse=True)
    out(f"\n{'query':<8}{'base_s':>8}{'cand_s':>8}{'cand@bh':>9}{'ratio':>7}")
    for ratio, q, b, c, nb, nc in rows[:15]:
        flag = "  <-- REGRESSION" if any(q == r[1] for r in regressions) else ""
        out(f"{q:<8}{b:>8.3f}{c:>8.3f}{nc:>9.3f}{ratio:>6.2f}x{flag}")
    only_b, only_c = sorted(set(bq) - set(cq)), sorted(set(cq) - set(bq))
    if only_b:
        out(f"\nremoved vs baseline: {', '.join(only_b)}")
    if only_c:
        out(f"new vs baseline: {', '.join(only_c)}")
    out(f"\nmedian normalized ratio: {med:.2f}x over {len(rows)} shared queries")
    start_h = pc / pb
    if rows and abs(h / start_h - 1) > 0.10:
        shared = sorted(set(bq) & set(cq))
        alt = sorted((cq[q] / start_h) / bq[q] for q in shared if bq[q] > 0)
        out(f"(under start-probe normalization the median would read "
            f"{alt[len(alt) // 2]:.2f}x -- printed for transparency, "
            f"not used)")

    if sem == "raw-only" and (med > 1.10 or med < 1 / 1.10 or regressions):
        out(f"\nINCONCLUSIVE: raw median {med:.2f}x across a "
            "bench_semantics change -- normalized comparison is invalid "
            "by construction; adjudicate against a same-semantics "
            "baseline (BASELINE.md records the anchor lineage)")
        return 0
    if med > 1.10 or med < 1 / 1.10:
        out(f"\nSuite-wide movement (median {med:.2f}x) -- per-query "
            "ratios are not evidence while the whole suite is displaced. "
            "Diagnosis:")
        win = probe_windows(base, cand, out)
        if win:
            out("INCONCLUSIVE: host window visible -- re-run the bench in "
                "a second window before trusting either direction")
            return 0
        if win is None:
            out("INCONCLUSIVE: no alignable probe timeline in these files "
                "-- adjudicate by re-running the bench in a second window")
            return 0
        if estimators_disagree(base, cand, out):
            out("INCONCLUSIVE: the two in-run probe families disagree on "
                "host speed -- a harness/state change contaminated one "
                "estimator (the r13 signature); no FAIL can rest on "
                "either. Re-anchor on a same-harness baseline or re-run.")
            return 0
        # timelines align and show NO host window: the displacement is
        # not environmental -- a shared-helper/config change moved the
        # whole suite, which is exactly what a regression gate must
        # catch (a slowdown spread across every query is still a
        # regression, not noise). EXCEPT when the displacement is
        # smaller than the in-run probes' own wobble: if matched probe
        # ratios routinely reach 1.2x on byte-identical stock-Spark
        # work, a 1.15x suite median is not attributable to code from
        # this data -- demand a re-run instead of manufacturing a FAIL
        if med > 1.10:
            rs = [r for _, r in matched_ratios(base, cand, "probes")]
            if rs:
                band = sorted(rs)[3 * len(rs) // 4] / median(rs)
                if med <= band:
                    out(f"INCONCLUSIVE: suite median {med:.2f}x sits inside "
                        f"the in-run probe noise band ({band:.2f}x = p75/"
                        f"median of matched probe ratios) -- the probes "
                        f"themselves wobble more than the suite moved; "
                        f"re-run before trusting either direction")
                    return 0
            out(f"\nFAIL: suite-wide slowdown (median {med:.2f}x) with a "
                "clean position-matched probe timeline -- treat as a code "
                "or config regression, not host drift")
            return 1
        out("suite-wide SPEEDUP with a clean probe timeline -- no flags")
        return 0
    if regressions:
        if estimators_disagree(base, cand, out):
            out(f"\nINCONCLUSIVE: {len(regressions)} would-be concentrated "
                f"flag(s) ({', '.join(q for _, q in regressions)}) while "
                "the two in-run probe families disagree on host speed -- "
                "a harness/state change re-priced what queries inherit "
                "(the r13 broadcast-drop signature); adjudicate against a "
                "same-harness baseline")
            return 0
        out(f"\nFAIL: {len(regressions)} concentrated regression(s) "
            f"> {threshold}x normalized (and > {threshold}x vs the median):")
        for ratio, q in sorted(regressions, reverse=True):
            out(f"  {q}: {ratio:.2f}x")
        return 1
    out("OK: no concentrated regressions")
    return 0


def selftest():
    """The r10 adjudication, as executable cases."""
    def bench(times, probes=None, probe=1.0, mem_probes=None, seed=None,
              semantics=None):
        d = {"value": sum(times.values()), "probe_sec": probe,
             "queries": dict(times)}
        if probes is not None:
            d["probes"] = probes
        if mem_probes is not None:
            d["mem_probes"] = mem_probes
        if seed is not None:
            d["shuffle_seed"] = seed
        if semantics is not None:
            d["bench_semantics"] = semantics
        return d

    quiet = lambda *a, **k: None
    qs = {f"q{i}": 1.0 for i in range(40)}
    flat = [[0, 1.0], [20, 1.0], [40, 1.0], [0, 1.0], [20, 1.0], [40, 1.0]]

    # 1. mid-run host window, clean start probe: second half 1.5x and
    #    the probe timeline shows it -> INCONCLUSIVE (no phantom flags),
    #    and the hot stretch is localized
    infl = {q: (1.5 if i >= 20 else 1.0)
            for i, (q, _) in enumerate(sorted(qs.items()))}
    hot = [[0, 1.0], [20, 1.5], [40, 1.5], [0, 1.5], [20, 1.5], [40, 1.0]]
    lines = []
    rc = diff(bench(qs, probes=flat), bench(infl, probes=hot), 1.3, lines.append)
    assert rc == 0, "mid-run window must not flag"
    assert any("HOST window" in l for l in lines), "window must be localized"

    # 2. the same suite movement in LEGACY files (no probes): still
    #    refused, with the re-run advice
    lines = []
    rc = diff(bench(qs), bench({q: t * 1.45 for q, t in qs.items()}),
              1.3, lines.append)
    assert rc == 0, "legacy uniform drift must not flag"
    assert any("re-running" in l for l in lines)

    # 3. a genuine single-query regression (median ~1.0) flags, with
    #    and without probe timelines
    reg = dict(qs); reg["q7"] = 3.0
    assert diff(bench(qs, probes=flat), bench(reg, probes=flat),
                1.3, quiet) == 1, "real regression must flag"
    assert diff(bench(qs), bench(reg), 1.3, quiet) == 1, \
        "legacy real regression must flag"

    # 4. isolated probe wobble (the measured within-run noise) does NOT
    #    read as a window, and clean queries stay clean
    wobble = [[0, 1.0], [20, 1.4], [40, 0.9], [0, 1.1], [20, 0.8], [40, 1.0]]
    lines = []
    rc = diff(bench(qs, probes=flat), bench(dict(qs), probes=wobble),
              1.3, lines.append)
    assert rc == 0 and any("OK:" in l for l in lines), \
        "probe wobble alone must stay clean"

    # 5. suite-wide slowdown with CLEAN aligned timelines is a code
    #    regression, not host drift: must FAIL, not INCONCLUSIVE
    lines = []
    rc = diff(bench(qs, probes=flat),
              bench({q: t * 1.45 for q, t in qs.items()}, probes=flat),
              1.3, lines.append)
    assert rc == 1, "clean-probe suite-wide slowdown must fail"
    assert any("code or config regression" in l for l in lines)

    # 6. a suite-size change moves emission positions -- probes that
    #    cannot be position-aligned are NO evidence (never fabricate a
    #    window or a clean bill from misaligned pairs)
    moved = [[0, 1.0], [25, 1.0], [50, 1.0], [0, 1.0], [25, 1.0], [50, 1.0]]
    lines = []
    rc = diff(bench(qs, probes=flat),
              bench({q: t * 1.45 for q, t in qs.items()}, probes=moved),
              1.3, lines.append)
    assert rc == 0, "misaligned timelines must stay inconclusive"
    assert any("no alignable probe timeline" in l for l in lines)

    # 7. a MEMORY-shaped window (mem probes hot, scan probes calm — the
    #    q48 signature) is still a window: INCONCLUSIVE, not FAIL. Base
    #    is the clean suite; candidate carries case 1's suite movement
    #    but only the mem-probe family sees the window
    memhot = [[0, 1.0], [20, 1.5], [40, 1.5], [0, 1.5], [20, 1.5], [40, 1.0]]
    lines = []
    rc = diff(bench(qs, probes=flat, mem_probes=flat),
              bench(infl, probes=flat, mem_probes=memhot), 1.3, lines.append)
    assert rc == 0, "mem-probe-only window must not flag"
    assert any("mem probe timeline shows" in l for l in lines), \
        "the mem family must localize the window"

    # 8. different shuffle seeds: timelines are not position-comparable
    #    -- suite movement stays INCONCLUSIVE even with 'clean' probes
    lines = []
    rc = diff(bench(qs, probes=flat, mem_probes=flat, seed=1),
              bench({q: t * 1.45 for q, t in qs.items()},
                    probes=flat, mem_probes=flat, seed=2),
              1.3, lines.append)
    assert rc == 0, "cross-seed suite movement must stay inconclusive"
    assert any("shuffle seeds differ" in l for l in lines)
    # same seed on both sides position-matches again (case 5's FAIL)
    assert diff(bench(qs, probes=flat, seed=7),
                bench({q: t * 1.45 for q, t in qs.items()},
                      probes=flat, seed=7), 1.3, quiet) == 1

    # 9. same seed but DIFFERENT suite sizes: shuffled orders diverge
    #    (a permutation of a different-length list), so clean-looking
    #    timelines are no evidence -- INCONCLUSIVE, not FAIL
    bigger = dict(qs); bigger.update({f"r{i}": 1.0 for i in range(3)})
    lines = []
    rc = diff(bench(qs, probes=flat, seed=7),
              bench({q: t * 1.45 for q, t in bigger.items()},
                    probes=flat, seed=7), 1.3, lines.append)
    assert rc == 0, "same-seed cross-size movement must stay inconclusive"
    assert any("different suite sizes" in l for l in lines)

    # 10. the r12 artifact: diverging COLD start probes (1.034 vs
    #     0.920) with an in-run timeline at parity must NOT manufacture
    #     a suite-wide FAIL -- the timeline median normalizes (median
    #     ~= raw movement) and both estimators are printed
    near = {q: t * 1.04 for q, t in qs.items()}
    lines = []
    rc = diff(bench(qs, probes=flat, probe=1.034),
              bench(near, probes=flat, probe=0.920), 1.3, lines.append)
    assert rc == 0, "cold-start probe divergence must not manufacture a FAIL"
    assert any("estimators disagree" in l for l in lines), \
        "diverging estimators must both be surfaced"
    assert any("median normalized ratio: 1.04x" in l for l in lines), \
        "timeline normalization must report the raw movement"
    assert any("start-probe normalization" in l for l in lines), \
        "the unused estimator's median must be printed for transparency"

    # 11. alphabetical runs at different suite sizes position-match
    #     index-wise but sit after different prefixes -- must WARN
    #     (while still normalizing by the matched timeline)
    grown = dict(qs)
    grown.update({f"s{i}": 1.0 for i in range(4)})
    lines = []
    rc = diff(bench(qs, probes=flat), bench(grown, probes=flat),
              1.3, lines.append)
    assert rc == 0
    assert any("WARNING: alphabetical runs at different suite sizes" in l
               for l in lines), "cross-size alphabetical match must warn"

    # 12. an in-run timeline that itself shows a hot stretch is NOT a
    #     normalization source (a partial window would absorb into the
    #     median): fall back to the start probe
    lines = []
    diff(bench(qs, probes=flat), bench(dict(qs), probes=hot),
         1.3, lines.append)
    assert any("hot stretch -- not a steady host-speed source" in l
               for l in lines), "hot timeline must not normalize"

    # 12b. a short-line TRIMMED timeline (pass starts/ends only) still
    #      pairs with an untrimmed one at the shared positions via
    #      (position, occurrence) keying -- normalization survives the
    #      r13 short-line trim
    full = [[0, 1.0], [0, 1.0], [20, 1.0], [40, 1.0], [0, 1.0], [20, 1.0], [40, 1.0]]
    trimmed = [[0, 1.0], [0, 1.0], [40, 1.0], [0, 1.0], [40, 1.0]]
    lines = []
    rc = diff(bench(qs, probes=full, probe=1.0),
              bench({q: t * 1.04 for q, t in qs.items()},
                    probes=trimmed, probe=0.89), 1.3, lines.append)
    assert rc == 0
    assert any("matched positions" in l and "timeline" in l for l in lines), \
        "trimmed timeline must still normalize (5 shared positions)"

    # 13. a suite displacement SMALLER than the in-run probes' own
    #     wobble (windowless noisy timeline) is not attributable to
    #     code -- INCONCLUSIVE, not FAIL; a displacement far beyond
    #     the band still fails (case 5)
    noisy = [[0, 1.0], [20, 1.3], [40, 0.8], [0, 1.2], [20, 0.75], [40, 1.0]]
    lines = []
    rc = diff(bench(qs, probes=flat),
              bench({q: t * 1.15 for q, t in qs.items()}, probes=noisy),
              1.3, lines.append)
    assert rc == 0, "displacement inside probe noise must stay inconclusive"
    assert any("probe noise band" in l for l in lines)

    # 14. the r13 signature: the two IN-RUN families disagree >10% on
    #     host speed (a harness change contaminated the scan family)
    #     while the suite reads displaced under the contaminated
    #     normalizer -- INCONCLUSIVE, never FAIL
    scan85 = [[0, 0.85], [20, 0.85], [40, 0.85], [0, 0.85], [20, 0.85], [40, 0.85]]
    lines = []
    rc = diff(bench(qs, probes=flat, mem_probes=flat),
              bench(dict(qs), probes=scan85, mem_probes=flat),
              1.3, lines.append)
    assert rc == 0, "estimator disagreement must not FAIL"
    assert any("DISAGREE" in l for l in lines), \
        "the disagreement must be surfaced"
    assert any("in-run probe families disagree" in l for l in lines), \
        "the INCONCLUSIVE verdict must name the disagreement"

    # 15. a sustained COLD stretch (two consecutive matched ratios
    #     < 0.8 -- the base run sat in a host window) is as invalid a
    #     steady-speed source as a hot one: fall back to start probe
    cold = [[0, 1.0], [20, 0.7], [40, 0.7], [0, 1.0], [20, 1.0], [40, 1.0]]
    lines = []
    diff(bench(qs, probes=flat), bench(dict(qs), probes=cold),
         1.3, lines.append)
    assert any("cold stretch" in l for l in lines), \
        "cold timeline must not normalize"

    # 16. bench_semantics: two stamped files with DIFFERENT versions
    #     compare raw-only -- a suite displacement is INCONCLUSIVE,
    #     never FAIL (the in-run probes inherited different harness
    #     state by construction)
    lines = []
    rc = diff(bench(qs, probes=flat, semantics=2),
              bench({q: t * 1.45 for q, t in qs.items()},
                    probes=flat, semantics=3), 1.3, lines.append)
    assert rc == 0, "cross-semantics displacement must stay inconclusive"
    assert any("RAW ratios only" in l for l in lines)
    assert any("bench_semantics change" in l for l in lines)
    # ... and a concentrated raw regression across versions also stays
    # report-only (no normalizer exists to attribute it)
    reg2 = dict(qs); reg2["q7"] = 3.0
    assert diff(bench(qs, probes=flat, semantics=2),
                bench(reg2, probes=flat, semantics=3), 1.3, quiet) == 0, \
        "cross-semantics concentrated movement must stay inconclusive"
    # SAME stamps behave exactly like unstamped files: case 5's FAIL
    assert diff(bench(qs, probes=flat, semantics=2),
                bench({q: t * 1.45 for q, t in qs.items()},
                      probes=flat, semantics=2), 1.3, quiet) == 1, \
        "same-semantics suite-wide slowdown must still fail"
    # stamped-vs-unstamped warns and falls through to the normal rules
    lines = []
    rc = diff(bench(qs, probes=flat),
              bench({q: t * 1.45 for q, t in qs.items()},
                    probes=flat, semantics=2), 1.3, lines.append)
    assert rc == 1, "unstamped-vs-stamped must fall through to case 5"
    assert any("missing a bench_semantics stamp" in l for l in lines)

    print("selftest OK (41 assertions)")
    return 0


def main():
    if len(sys.argv) >= 2 and sys.argv[1] == "--selftest":
        sys.exit(selftest())
    base, cand = load(sys.argv[1]), load(sys.argv[2])
    threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 1.3
    sys.exit(diff(base, cand, threshold))


if __name__ == "__main__":
    main()
