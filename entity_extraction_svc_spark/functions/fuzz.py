"""Indel-based fuzzy string ratio, same contract as ``rapidfuzz.fuzz.ratio``.

The reference scores candidate labels with ``fuzz.ratio(label_tok, ent_tok)``
(``/root/reference/annotators/entity_extraction_base/src/entity_linking.py:1217``).
rapidfuzz is unavailable here; ``fuzz.ratio`` is the normalized Indel
similarity ``100 * 2*LCS(a,b) / (len(a)+len(b))`` which we compute with a
classic O(len(a)*len(b)) DP.  Tokens are short (words), so the DP is cheap;
an LRU cache absorbs the Zipfian repetition of common words across a batch.
"""

from __future__ import annotations

from functools import lru_cache


@lru_cache(maxsize=65536)
def ratio(s1: str, s2: str) -> float:
    """Normalized Indel similarity in [0, 100]."""
    if not s1 and not s2:
        return 100.0
    if not s1 or not s2:
        return 0.0
    la, lb = len(s1), len(s2)
    # LCS length DP, one row at a time
    prev = [0] * (lb + 1)
    for i in range(1, la + 1):
        cur = [0] * (lb + 1)
        c1 = s1[i - 1]
        for j in range(1, lb + 1):
            if c1 == s2[j - 1]:
                cur[j] = prev[j - 1] + 1
            else:
                cur[j] = cur[j - 1] if cur[j - 1] >= prev[j] else prev[j]
        prev = cur
    lcs = prev[lb]
    return 100.0 * (2.0 * lcs) / (la + lb)
