"""Caption metrics: BLEU-1..4, ROUGE-L, CIDEr-D, METEOR.

The reference scores captions through the external `nlg-eval` package
(main_task_caption.py:12,612-615), which wraps the MSCOCO caption scorers
(Java METEOR included). Here the scorers are reimplemented in pure Python
from the published algorithms:

  - BLEU: corpus-level, closest-reference-length brevity penalty
          (Papineni et al. 2002; coco-caption accumulation semantics)
  - ROUGE-L: LCS F-measure with beta=1.2, max over refs, corpus mean
  - CIDEr-D: tf-idf 1..4-gram cosine with length penalty sigma=6, x10
  - METEOR: pure-Python approximation of METEOR 1.5 — exact + Porter-stem
    alignment stages, alpha=0.9/beta=3/gamma=0.5, WITHOUT the Java synonym /
    paraphrase tables (scores trend slightly lower than Java METEOR)

Inputs: hyps: list[str]; refs: list[list[str]] (multi-reference per row,
reference assembles these for MSRVTT at main_task_caption.py:599-607).
"""

from __future__ import annotations

import math
from collections import Counter, defaultdict
from typing import Dict, List, Sequence


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


# --------------------------------------------------------------------- #
# BLEU
# --------------------------------------------------------------------- #
def bleu(refs: List[List[str]], hyps: List[str], max_n: int = 4) -> List[float]:
    tiny, small = 1e-15, 1e-9
    correct = [0.0] * max_n
    guess = [0.0] * max_n
    hyp_len = 0.0
    ref_len = 0.0
    for refs_i, hyp in zip(refs, hyps):
        h = hyp.split()
        rs = [r.split() for r in refs_i]
        hyp_len += len(h)
        # closest reference length (ties -> shorter)
        ref_len += min((abs(len(r) - len(h)), len(r)) for r in rs)[1]
        for n in range(1, max_n + 1):
            hc = _ngrams(h, n)
            max_rc: Counter = Counter()
            for r in rs:
                rc = _ngrams(r, n)
                for g, c in rc.items():
                    if c > max_rc[g]:
                        max_rc[g] = c
            clipped = sum(min(c, max_rc[g]) for g, c in hc.items())
            correct[n - 1] += clipped
            guess[n - 1] += max(0, len(h) - n + 1)

    ratio = hyp_len / (ref_len + small)
    bp = 1.0 if ratio > 1.0 else math.exp(1.0 - 1.0 / (ratio + small)) if ratio > 0 else 0.0
    scores = []
    logsum = 0.0
    for n in range(max_n):
        p = (correct[n] + tiny) / (guess[n] + small)
        logsum += math.log(p)
        scores.append(bp * math.exp(logsum / (n + 1)))
    return scores


# --------------------------------------------------------------------- #
# ROUGE-L
# --------------------------------------------------------------------- #
def _lcs_len(a: Sequence[str], b: Sequence[str]) -> int:
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def rouge_l(refs: List[List[str]], hyps: List[str], beta: float = 1.2) -> float:
    total = 0.0
    for refs_i, hyp in zip(refs, hyps):
        h = hyp.split()
        best = 0.0
        for r in refs_i:
            rt = r.split()
            lcs = _lcs_len(h, rt)
            if lcs == 0:
                continue
            p = lcs / len(h) if h else 0.0
            rec = lcs / len(rt) if rt else 0.0
            if p > 0 and rec > 0:
                f = ((1 + beta**2) * p * rec) / (rec + beta**2 * p)
                best = max(best, f)
        total += best
    return total / max(len(hyps), 1)


# --------------------------------------------------------------------- #
# CIDEr-D
# --------------------------------------------------------------------- #
def cider_d(
    refs: List[List[str]], hyps: List[str], max_n: int = 4, sigma: float = 6.0
) -> float:
    # document frequency over reference sets (per image)
    df: Dict[tuple, float] = defaultdict(float)
    ref_counts = []
    for refs_i in refs:
        per_image = set()
        counts_i = []
        for r in refs_i:
            toks = r.split()
            cnts = {}
            for n in range(1, max_n + 1):
                for g, c in _ngrams(toks, n).items():
                    cnts[g] = c
                    per_image.add(g)
            counts_i.append((cnts, len(toks)))
        ref_counts.append(counts_i)
        for g in per_image:
            df[g] += 1.0

    log_num_images = math.log(max(len(refs), 1))

    def vec(cnts: Dict[tuple, int]):
        v = [defaultdict(float) for _ in range(max_n)]
        norm = [0.0] * max_n
        for g, c in cnts.items():
            idf = log_num_images - math.log(max(1.0, df[g]))
            n = len(g) - 1
            v[n][g] = c * idf
            norm[n] += v[n][g] ** 2
        return v, [math.sqrt(x) for x in norm]

    total = 0.0
    for refs_i_counts, hyp in zip(ref_counts, hyps):
        toks = hyp.split()
        hc: Dict[tuple, int] = {}
        for n in range(1, max_n + 1):
            for g, c in _ngrams(toks, n).items():
                hc[g] = c
        hv, hnorm = vec(hc)
        score_i = 0.0
        for rc, rlen in refs_i_counts:
            rv, rnorm = vec(rc)
            delta = len(toks) - rlen
            for n in range(max_n):
                num = 0.0
                for g, w in hv[n].items():
                    # CIDEr-D: clip hyp tf-idf to ref tf-idf
                    num += min(w, rv[n].get(g, 0.0)) * rv[n].get(g, 0.0)
                denom = hnorm[n] * rnorm[n]
                val = num / denom if denom > 0 else 0.0
                val *= math.exp(-(delta**2) / (2 * sigma**2))
                score_i += val
        score_i /= max(len(refs_i_counts), 1) * max_n
        total += score_i
    return 10.0 * total / max(len(hyps), 1)


# --------------------------------------------------------------------- #
# METEOR (pure-Python approximation)
# --------------------------------------------------------------------- #
def _porter_stem(w: str) -> str:
    """Compact Porter stemmer (steps 1a/1b/1c + common suffixes)."""
    if len(w) <= 3:
        return w
    for suf, rep in (
        ("sses", "ss"), ("ies", "i"), ("ss", "ss"), ("s", ""),
    ):
        if w.endswith(suf):
            w = w[: len(w) - len(suf)] + rep
            break
    for suf in ("eed", "ed", "ing"):
        if w.endswith(suf):
            stem = w[: len(w) - len(suf)]
            if suf == "eed":
                if sum(ch in "aeiou" for ch in stem):
                    w = stem + "ee"
            elif any(ch in "aeiou" for ch in stem):
                w = stem
                if w.endswith(("at", "bl", "iz")):
                    w += "e"
            break
    if w.endswith("y") and any(ch in "aeiou" for ch in w[:-1]):
        w = w[:-1] + "i"
    for suf, rep in (
        ("ational", "ate"), ("tional", "tion"), ("ization", "ize"),
        ("fulness", "ful"), ("ousness", "ous"), ("iveness", "ive"),
        ("ment", ""), ("ness", ""),
    ):
        if w.endswith(suf) and len(w) - len(suf) >= 2:
            w = w[: len(w) - len(suf)] + rep
            break
    return w


def _meteor_align(h: List[str], r: List[str]):
    """Greedy two-stage alignment: exact, then stems. Returns matched index
    pairs (hyp_idx, ref_idx)."""
    matches = []
    used_h = [False] * len(h)
    used_r = [False] * len(r)
    for stage in ("exact", "stem"):
        key_h = h if stage == "exact" else [_porter_stem(w) for w in h]
        key_r = r if stage == "exact" else [_porter_stem(w) for w in r]
        for i, hw in enumerate(key_h):
            if used_h[i]:
                continue
            for j, rw in enumerate(key_r):
                if not used_r[j] and hw == rw:
                    matches.append((i, j))
                    used_h[i] = True
                    used_r[j] = True
                    break
    return sorted(matches)


def meteor(
    refs: List[List[str]], hyps: List[str],
    alpha: float = 0.9, beta: float = 3.0, gamma: float = 0.5,
) -> float:
    total = 0.0
    for refs_i, hyp in zip(refs, hyps):
        h = hyp.lower().split()
        best = 0.0
        for ref in refs_i:
            r = ref.lower().split()
            m = _meteor_align(h, r)
            if not m or not h or not r:
                continue
            prec = len(m) / len(h)
            rec = len(m) / len(r)
            fmean = prec * rec / (alpha * prec + (1 - alpha) * rec)
            # chunks: contiguous runs in both hyp and ref order
            chunks = 1
            for (i0, j0), (i1, j1) in zip(m, m[1:]):
                if not (i1 == i0 + 1 and j1 == j0 + 1):
                    chunks += 1
            penalty = gamma * (chunks / len(m)) ** beta
            best = max(best, fmean * (1 - penalty))
        total += best
    return total / max(len(hyps), 1)


# --------------------------------------------------------------------- #
def compute_caption_metrics(refs: List[List[str]], hyps: List[str]) -> Dict[str, float]:
    """Full nlg-eval-style metric dict (reference eval prints these,
    main_task_caption.py:613-615)."""
    b = bleu(refs, hyps)
    return {
        "Bleu_1": b[0],
        "Bleu_2": b[1],
        "Bleu_3": b[2],
        "Bleu_4": b[3],
        "METEOR": meteor(refs, hyps),
        "ROUGE_L": rouge_l(refs, hyps),
        "CIDEr": cider_d(refs, hyps),
    }
