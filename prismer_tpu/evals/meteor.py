"""METEOR-lite — a documented approximation of the METEOR 1.5 jar the
reference runs through pycocoevalcap (Java; coco_caption_eval prints it,
reference utils.py:38-40). No Java/WordNet in this image, so this scores
with the official constants and the exact+stem matcher stages only:

  stages:  exact match, then Porter-stem match on leftovers
           (the jar adds WordNet synonymy and paraphrase tables)
  Fmean  = P R / (alpha P + (1 - alpha) R),        alpha = 0.9
  frag   = chunks / matches; penalty = gamma frag^beta, beta = 3, gamma = 0.5
  score  = Fmean (1 - penalty); max over refs; corpus = MEAN of sentence
           scores (the jar aggregates corpus-level sufficient statistics —
           a further documented deviation)

Alignment is leftmost-greedy per stage (the jar beam-searches the
chunk-minimizing alignment); on short caption text the difference is small.
Use for relative comparison; CIDEr remains the gating metric."""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

from prismer_tpu.evals.tokenizer import ptb_tokenize

ALPHA, BETA, GAMMA = 0.9, 3.0, 0.5

try:
    from nltk.stem.porter import PorterStemmer
    _STEM = PorterStemmer().stem
except Exception:  # pragma: no cover - nltk is present in this image
    _STEM = lambda w: w


def _align(cand: List[str], ref: List[str]) -> List[Tuple[int, int]]:
    """(cand_idx, ref_idx) matches: exact stage then stem stage, each
    leftmost-greedy over the still-unmatched positions."""
    matches: List[Tuple[int, int]] = []
    used_c = [False] * len(cand)
    used_r = [False] * len(ref)
    for keyed in (cand, [_STEM(w) for w in cand]):
        ref_keys = ref if keyed is cand else [_STEM(w) for w in ref]
        for ci, w in enumerate(keyed):
            if used_c[ci]:
                continue
            for ri, rw in enumerate(ref_keys):
                if not used_r[ri] and w == rw:
                    matches.append((ci, ri))
                    used_c[ci] = True
                    used_r[ri] = True
                    break
    return sorted(matches)


def _chunks(matches: List[Tuple[int, int]]) -> int:
    n = 0
    prev = None
    for ci, ri in matches:
        if prev is None or ci != prev[0] + 1 or ri != prev[1] + 1:
            n += 1
        prev = (ci, ri)
    return n


def meteor_sentence(cand: List[str], refs: Sequence[List[str]]) -> float:
    best = 0.0
    for ref in refs:
        matches = _align(cand, ref)
        m = len(matches)
        if m == 0 or not cand or not ref:
            continue
        p = m / len(cand)
        r = m / len(ref)
        fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
        frag = _chunks(matches) / m
        score = fmean * (1.0 - GAMMA * frag ** BETA)
        best = max(best, score)
    return best


def meteor(candidates: Dict, references: Dict) -> Tuple[float, Dict]:
    scores = {}
    for i, cand in candidates.items():
        scores[i] = meteor_sentence(ptb_tokenize(cand),
                                    [ptb_tokenize(r) for r in references[i]])
    corpus = sum(scores.values()) / max(len(scores), 1)
    return corpus, scores
