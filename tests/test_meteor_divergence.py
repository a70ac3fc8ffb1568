"""Quantify the METEOR synonym/paraphrase divergence (VERDICT r2 item 1).

The reference scores captions with nlg-eval's Java METEOR 1.5
(/root/reference/main_task_caption.py:12,612-615), whose aligner runs FOUR
matcher modules in priority order: exact (w=1.0), stem (w=0.6), WordNet
synonym (w=0.8), paraphrase table (w=0.6) (Denkowski & Lavie 2014 §2.1).
Our production scorer (univl_tpu/evals/caption_metrics.py) implements
exact+stem always and synonym via a pluggable table; the WordNet corpus
and the paraphrase db are genuinely absent from this image, so production
scores are a LOWER BOUND on Java METEOR.

This file turns that qualitative note into a measured bound:

  * ORACLE: an exhaustive-alignment METEOR 1.5 scorer supporting all four
    modules — exact max-weight DP over (hyp position, ref bitmask) followed
    by chunk-minimizing backtrack over ALL optimal alignments, so it cannot
    be beaten by the production beam search. It shares the scoring formula
    (`_meteor_from_stats`) and word weights with production, so any score
    difference is attributable ONLY to the matcher stages.
  * DATA: hand-authored mini synonym/paraphrase tables covering the fixture
    vocabulary (synonym entries are genuine WordNet synsets, e.g.
    cook/prepare = cook.v.02, choose/select = choose.v.01; paraphrase
    entries are typical METEOR paraphrase-db rows like "put in"~"add").
  * FIXTURES: 20 caption-length hyp/ref pairs — controls (no synonym or
    paraphrase content, deficit MUST be 0), synonym-divergence pairs,
    paraphrase-divergence pairs, mixed pairs.

Measured bounds are asserted at the bottom and recorded in docs/PARITY.md;
if the implementation or fixtures change the numbers, the assertions (and
the doc) must be updated together.
"""

from __future__ import annotations

import itertools

import pytest

from univl_tpu.evals.caption_metrics import (
    _M15,
    _meteor_from_stats,
    _stemmer,
    _word_weight,
    meteor,
)

STEM = _stemmer()
W_PARA = 0.6  # METEOR 1.5 English rank-task paraphrase-module weight

# --------------------------------------------------------------------- #
# Mini data tables standing in for the absent WordNet / paraphrase files.
# Synonym sets: each inner tuple is one synset (genuine WordNet groupings).
# --------------------------------------------------------------------- #
_SYNSETS = [
    ("buy", "purchase"),          # buy.v.01
    ("begin", "start"),           # begin.v.01
    ("small", "little"),          # small.a.01
    ("big", "large"),             # large.a.01
    ("shut", "close"),            # shut.v.01
    ("speak", "talk"),            # talk.v.02
    ("choose", "select"),         # choose.v.01
    ("quickly", "rapidly"),       # quickly.r.01
    ("happy", "glad"),            # glad.a.01
    ("cook", "prepare"),          # cook.v.02 (cook, fix, ready, make, prepare)
]

SYN_TABLE = {}
for sid, words in enumerate(_SYNSETS):
    for w in words:
        SYN_TABLE.setdefault(w, set()).add(sid)
SYN_TABLE = {w: frozenset(s) for w, s in SYN_TABLE.items()}

# Paraphrase table: symmetric phrase pairs (token tuples).
PARA_TABLE = [
    (("put", "in"), ("add",)),
    (("right", "away"), ("immediately",)),
    (("take", "out"), ("remove",)),
    (("cut", "up"), ("chop",)),
    (("a", "lot", "of"), ("many",)),
]


# --------------------------------------------------------------------- #
# Oracle: exhaustive METEOR 1.5 alignment with all four matcher modules.
# --------------------------------------------------------------------- #
def _oracle_candidates(h, r, synonyms, paraphrases):
    """All candidate matches as (i, li, j, lj, w, module): hyp span
    [i, i+li), ref span [j, j+lj), module weight w. Word modules use
    METEOR's priority order exact > stem > synonym."""
    cands = []
    hs = [STEM(w) for w in h]
    rs = [STEM(w) for w in r]
    empty = frozenset()
    for i, hw in enumerate(h):
        for j, rw in enumerate(r):
            if hw == rw:
                cands.append((i, 1, j, 1, _M15["w_exact"], "exact"))
            elif hs[i] == rs[j]:
                cands.append((i, 1, j, 1, _M15["w_stem"], "stem"))
            elif synonyms and not synonyms.get(hw, empty).isdisjoint(
                    synonyms.get(rw, empty)):
                cands.append((i, 1, j, 1, _M15["w_syn"], "syn"))
    if paraphrases:
        for pa, pb in paraphrases:
            for xa, xb in ((pa, pb), (pb, pa)):
                for i in range(len(h) - len(xa) + 1):
                    if tuple(h[i:i + len(xa)]) != xa:
                        continue
                    for j in range(len(r) - len(xb) + 1):
                        if tuple(r[j:j + len(xb)]) == xb:
                            cands.append(
                                (i, len(xa), j, len(xb), W_PARA, "para"))
    return cands


def _oracle_align(h, r, synonyms, paraphrases):
    """Exact optimum: maximize sum of w*(li+lj)/2 (module weight scaled by
    span coverage — reduces to plain module-weight sum for word matches),
    tie-break minimum chunks over ALL weight-optimal alignments."""
    cands = _oracle_candidates(h, r, synonyms, paraphrases)
    by_start = {}
    for c in cands:
        by_start.setdefault(c[0], []).append(c)

    n = len(h)
    from functools import lru_cache

    def span_mask(j, lj):
        return ((1 << lj) - 1) << j

    @lru_cache(maxsize=None)
    def best(i, rmask):
        if i >= n:
            return 0.0
        w = best(i + 1, rmask)  # skip hyp position i
        for (ci, li, j, lj, cw, _mod) in by_start.get(i, ()):
            m = span_mask(j, lj)
            if rmask & m:
                continue
            w = max(w, cw * (li + lj) / 2.0 + best(i + li, rmask | m))
        return w

    opt = best(0, 0)

    # Enumerate all weight-optimal alignments (bounded), pick min chunks.
    best_matches, best_chunks = None, None
    stack = [(0, 0, 0.0, ())]
    budget = 200000
    while stack and budget > 0:
        budget -= 1
        i, rmask, acc, ms = stack.pop()
        if i >= n:
            if abs(acc - opt) < 1e-9:
                ch = _count_chunks(ms)
                if best_chunks is None or ch < best_chunks:
                    best_matches, best_chunks = ms, ch
            continue
        # prune non-optimal branches exactly
        if acc + best(i, rmask) < opt - 1e-9:
            continue
        stack.append((i + 1, rmask, acc, ms))
        for (ci, li, j, lj, cw, mod) in by_start.get(i, ()):
            m = span_mask(j, lj)
            if rmask & m:
                continue
            stack.append((i + li, rmask | m,
                          acc + cw * (li + lj) / 2.0,
                          ms + ((ci, li, j, lj, cw, mod),)))
    assert budget > 0, "oracle enumeration budget exhausted"
    return list(best_matches or ())


def _count_chunks(matches):
    ms = sorted(matches)
    chunks, prev = 0, None
    for (i, li, j, lj, _w, _mod) in ms:
        if prev is None or not (i == prev[0] + prev[1] and j == prev[2] + prev[3]):
            chunks += 1
        prev = (i, li, j, lj)
    return chunks


def syn_para_token_incidence(refs, hyps, synonyms, paraphrases):
    """Fraction of hyp tokens covered by synonym/paraphrase matches in the
    oracle's optimal alignments — the quantity the corpus-level METEOR
    deficit scales with (see test_deficit_vs_incidence_slope)."""
    covered, total = 0, 0
    for refs_i, hyp in zip(refs, hyps):
        h = hyp.lower().split()
        total += len(h)
        best_cov, best_score = 0, -1.0
        a, b, g, d = (_M15["alpha"], _M15["beta"], _M15["gamma"],
                      _M15["delta"])
        for ref in refs_i:
            r = ref.lower().split()
            s = _oracle_stats(h, r, synonyms, paraphrases, d)
            sc = _meteor_from_stats(s, a, b, g)
            if sc > best_score:
                ms = _oracle_align(h, r, synonyms, paraphrases)
                best_cov = sum(li for (_i, li, _j, _lj, _w, mod) in ms
                               if mod in ("syn", "para"))
                best_score = sc
        covered += best_cov
    return covered / max(total, 1)


def _oracle_stats(h, r, synonyms, paraphrases, delta):
    matches = _oracle_align(h, r, synonyms, paraphrases)
    wp = sum(w * sum(_word_weight(h[i + k], delta) for k in range(li))
             for (i, li, j, lj, w, _mod) in matches)
    wr = sum(w * sum(_word_weight(r[j + k], delta) for k in range(lj))
             for (i, li, j, lj, w, _mod) in matches)
    cov_h = sum(li for (_i, li, _j, _lj, _w, _mod) in matches)
    cov_r = sum(lj for (_i, _li, _j, lj, _w, _mod) in matches)
    chunks = _count_chunks(matches)
    if chunks == 1 and cov_h == len(h) and cov_r == len(r) == len(h):
        chunks = 0  # mirror production's perfectly-contiguous special case
    return dict(
        wp=wp, wr=wr,
        lh=sum(_word_weight(w, delta) for w in h),
        lr=sum(_word_weight(w, delta) for w in r),
        chunks=float(chunks), m=(cov_h + cov_r) / 2.0,
    )


def oracle_meteor(refs, hyps, synonyms=None, paraphrases=None):
    """Corpus METEOR with the full matcher stack (same aggregation and
    formula as production meteor())."""
    a, b, g, d = _M15["alpha"], _M15["beta"], _M15["gamma"], _M15["delta"]
    agg = dict(wp=0.0, wr=0.0, lh=0.0, lr=0.0, chunks=0.0, m=0.0)
    for refs_i, hyp in zip(refs, hyps):
        h = hyp.lower().split()
        best_s, best_score = None, -1.0
        for ref in refs_i:
            s = _oracle_stats(h, ref.lower().split(), synonyms, paraphrases, d)
            sc = _meteor_from_stats(s, a, b, g)
            if sc > best_score:
                best_s, best_score = s, sc
        if best_s is not None:
            for k in agg:
                agg[k] += best_s[k]
    return _meteor_from_stats(agg, a, b, g)


# --------------------------------------------------------------------- #
# Labeled fixture set: (tag, hyp, ref)
# --------------------------------------------------------------------- #
FIXTURES = [
    # -- controls: no synonym/paraphrase vocabulary; deficit MUST be 0
    ("control", "the chef slices the onions finely",
     "the chef sliced the onion finely"),
    ("control", "add salt and pepper to the pan",
     "to the pan add salt and pepper"),
    ("control", "pour the sauce over the chicken",
     "spread the glaze over the chicken"),
    ("control", "heat the oil in the wok before frying",
     "heat the oil in the wok"),
    ("control", "mix the eggs with the sugar until smooth",
     "mix eggs with sugar until it is smooth"),
    # -- synonym-only divergence
    ("syn", "cook the rice in a small pot",
     "prepare the rice in a little pot"),
    ("syn", "begin mixing the flour and the water",
     "start mixing the flour and the water"),
    ("syn", "close the lid and wait five minutes",
     "shut the lid and wait five minutes"),
    ("syn", "select a large bowl for the salad",
     "choose a big bowl for the salad"),
    ("syn", "stir the soup quickly over high heat",
     "stir the soup rapidly over high heat"),
    ("syn", "buy fresh vegetables from the market",
     "purchase fresh vegetables from the market"),
    ("syn", "purchase a little skillet for the eggs",
     "buy a small skillet for the eggs"),
    # -- paraphrase-only divergence
    ("para", "put in the garlic and stir the sauce",
     "add the garlic and stir the sauce"),
    ("para", "serve the dish right away with bread",
     "serve the dish immediately with bread"),
    ("para", "take out the seeds from the pepper",
     "remove the seeds from the pepper"),
    ("para", "cut up the carrots into thin strips",
     "chop the carrots into thin strips"),
    ("para", "add a lot of spices to the stew",
     "add many spices to the stew"),
    # -- mixed synonym + paraphrase
    ("mixed", "begin by cutting up a large onion",
     "start by chopping a big onion"),
    ("mixed", "cook the pasta and serve it right away",
     "prepare the pasta and serve it immediately"),
    ("mixed", "put in the butter and stir quickly",
     "add the butter and stir rapidly"),
]

HYPS = [h for _, h, _ in FIXTURES]
REFS = [[r] for _, _, r in FIXTURES]
TAGS = [t for t, _, _ in FIXTURES]


def _per_pair(fn):
    return [fn([REFS[i]], [HYPS[i]]) for i in range(len(FIXTURES))]


@pytest.fixture(scope="module")
def scores():
    ours = _per_pair(lambda r, h: meteor(r, h))
    ours_syn = _per_pair(lambda r, h: meteor(r, h, synonyms=SYN_TABLE))
    oracle = _per_pair(
        lambda r, h: oracle_meteor(r, h, synonyms=SYN_TABLE,
                                   paraphrases=PARA_TABLE))
    oracle_syn_only = _per_pair(
        lambda r, h: oracle_meteor(r, h, synonyms=SYN_TABLE))
    return ours, ours_syn, oracle, oracle_syn_only


def test_oracle_matches_production_on_exact_stem_only():
    """With no synonym/paraphrase tables the oracle and the production beam
    aligner must produce IDENTICAL scores on every fixture (the beam search
    is optimal at caption lengths) — pins that the measured deficit comes
    from the matcher stages, not alignment-search differences."""
    for i in range(len(FIXTURES)):
        ours = meteor([REFS[i]], [HYPS[i]])
        orc = oracle_meteor([REFS[i]], [HYPS[i]])
        assert abs(ours - orc) < 1e-12, (TAGS[i], HYPS[i], ours, orc)


def test_controls_have_zero_deficit(scores):
    ours, _, oracle, _ = scores
    for i, t in enumerate(TAGS):
        if t == "control":
            assert abs(oracle[i] - ours[i]) < 1e-12, (HYPS[i], ours[i], oracle[i])


def test_synonym_stage_closes_synonym_deficit(scores):
    """Production meteor(synonyms=...) must reach the oracle exactly on
    every pair whose divergence is synonym-only — i.e. the pluggable
    synonym stage is complete and only the DATA file is missing."""
    _, ours_syn, _, oracle_syn_only = scores
    for i, t in enumerate(TAGS):
        if t in ("control", "syn"):
            assert abs(ours_syn[i] - oracle_syn_only[i]) < 1e-12, (
                TAGS[i], HYPS[i], ours_syn[i], oracle_syn_only[i])


def test_deficit_is_lower_bound(scores):
    ours, _, oracle, _ = scores
    for i in range(len(FIXTURES)):
        assert oracle[i] - ours[i] > -1e-12


def test_measured_divergence_bound(scores):
    """The headline numbers recorded in docs/PARITY.md. These fixtures are
    DELIBERATELY synonym/paraphrase-dense (every non-control pair has 1-2
    divergent content words in 7-9-word captions), so the max here is a
    worst-case-style per-segment bound; real YouCook2/MSRVTT hyp/ref pairs
    hit these matchers far more sparsely."""
    import statistics

    ours, ours_syn, oracle, _ = scores
    div = [o - u for o, u in zip(oracle, ours)]
    div_nc = [d for d, t in zip(div, TAGS) if t != "control"]
    corpus_ours = meteor(REFS, HYPS)
    corpus_oracle = oracle_meteor(REFS, HYPS, synonyms=SYN_TABLE,
                                  paraphrases=PARA_TABLE)
    corpus_syn = meteor(REFS, HYPS, synonyms=SYN_TABLE)
    print(f"\nMETEOR divergence on {len(FIXTURES)} labeled pairs "
          f"({len(div_nc)} with synonym/paraphrase content):")
    print(f"  per-pair deficit: max {max(div):.4f}  "
          f"median(non-control) {statistics.median(div_nc):.4f}")
    print(f"  corpus: ours {corpus_ours:.4f}  +synonyms {corpus_syn:.4f}  "
          f"full oracle {corpus_oracle:.4f}  "
          f"(deficit {corpus_oracle - corpus_ours:.4f})")
    # Measured values (recorded in docs/PARITY.md — update BOTH if the
    # fixtures change): max per-pair 0.6197 (a 7-word pair whose ONLY two
    # content mismatches are synonyms: the missing matches cut P/R and
    # break the single-chunk alignment, compounding the fragmentation
    # penalty), median non-control 0.2053, corpus deficit 0.1458 on this
    # deliberately divergence-dense set.
    assert max(div) <= 0.63, max(div)
    assert statistics.median(div_nc) <= 0.22, statistics.median(div_nc)
    assert corpus_oracle - corpus_ours <= 0.16, corpus_oracle - corpus_ours


def test_deficit_vs_incidence_slope(scores):
    """What a BASELINE.md METEOR comparison actually needs: the corpus
    deficit as a function of synonym/paraphrase-match INCIDENCE (fraction
    of hyp tokens matched only by the missing modules). Mix the divergent
    fixtures into the control pool at increasing rates and fit the slope;
    real caption evals sit at low incidence (a trained model mostly emits
    the reference vocabulary), so the interpretable statement is
    `METEOR deficit ~= slope * incidence`."""
    controls = [i for i, t in enumerate(TAGS) if t == "control"]
    divergent = [i for i, t in enumerate(TAGS) if t != "control"]
    rows = []
    for n_div in (0, 3, 7, 11, 15):
        idx = controls * 3 + divergent[:n_div]
        refs = [REFS[i] for i in idx]
        hyps = [HYPS[i] for i in idx]
        ours = meteor(refs, hyps)
        orc = oracle_meteor(refs, hyps, synonyms=SYN_TABLE,
                            paraphrases=PARA_TABLE)
        inc = syn_para_token_incidence(refs, hyps, SYN_TABLE, PARA_TABLE)
        rows.append((inc, orc - ours))
    print("\nincidence -> corpus deficit:")
    for inc, d in rows:
        print(f"  {inc:6.3f} -> {d:.4f}")
    xs = [r[0] for r in rows]
    ys = [r[1] for r in rows]
    low_slope = ys[1] / xs[1]  # the low-incidence regime real evals sit in
    ls_slope = sum(x * y for x, y in zip(xs, ys)) / max(
        sum(x * x for x in xs), 1e-12)
    print(f"  low-incidence slope {low_slope:.3f}, least-squares "
          f"{ls_slope:.3f} METEOR per unit token incidence (concave)")
    assert rows[0][1] < 1e-12  # zero incidence -> zero deficit
    assert all(ys[i] <= ys[i + 1] + 1e-9 for i in range(len(ys) - 1))
    # Measured: low-incidence slope 1.06 (concave, least-squares 0.79 over
    # the full 0-14% range) — recorded in docs/PARITY.md. At a realistic
    # 1-2% token incidence this bounds the BASELINE.md METEOR comparison
    # uncertainty at ~0.011-0.022 absolute.
    assert 0.9 <= low_slope <= 1.3, low_slope
    assert 0.6 <= ls_slope <= 1.2, ls_slope


def test_paraphrase_stage_closes_full_deficit():
    """Round-4: the paraphrase matcher is now PRODUCTION code
    (caption_metrics.meteor(..., paraphrases=...), span-aware aligner).
    With both tables plugged, the production beam aligner must reach the
    exhaustive four-module oracle EXACTLY on every fixture — paraphrase-
    only pairs, mixed pairs, and the corpus aggregate. Only the DATA files
    remain absent (auto-load hooks: load_wordnet_synonyms,
    load_meteor_paraphrases)."""
    for i in range(len(FIXTURES)):
        ours = meteor([REFS[i]], [HYPS[i]],
                      synonyms=SYN_TABLE, paraphrases=PARA_TABLE)
        orc = oracle_meteor([REFS[i]], [HYPS[i]],
                            synonyms=SYN_TABLE, paraphrases=PARA_TABLE)
        assert abs(ours - orc) < 1e-12, (TAGS[i], HYPS[i], ours, orc)
    c_ours = meteor(REFS, HYPS, synonyms=SYN_TABLE, paraphrases=PARA_TABLE)
    c_orc = oracle_meteor(REFS, HYPS, synonyms=SYN_TABLE,
                          paraphrases=PARA_TABLE)
    assert abs(c_ours - c_orc) < 1e-12, (c_ours, c_orc)


def test_paraphrase_loader_formats(tmp_path):
    """load_meteor_paraphrases: TSV and METEOR alternating-line formats,
    .gz transparent, None when absent."""
    import gzip

    from univl_tpu.evals.caption_metrics import load_meteor_paraphrases

    tsv = tmp_path / "para.tsv"
    tsv.write_text("# comment\nput in\tadd\nright away\timmediately\n")
    t = load_meteor_paraphrases(str(tsv))
    assert (("put", "in"), ("add",)) in t
    assert (("right", "away"), ("immediately",)) in t

    alt = tmp_path / "paraphrase-en.gz"
    with gzip.open(alt, "wt") as f:
        f.write("take out\nremove\ncut up\nchop\n")
    t = load_meteor_paraphrases(str(alt))
    assert (("take", "out"), ("remove",)) in t
    assert (("cut", "up"), ("chop",)) in t

    assert load_meteor_paraphrases(str(tmp_path / "missing")) is None

    # the loaded TSV table drives the production matcher end-to-end
    m0 = meteor([["add the garlic"]], ["put in the garlic"])
    m1 = meteor([["add the garlic"]], ["put in the garlic"],
                paraphrases=load_meteor_paraphrases(str(tsv)))
    assert m1 > m0
