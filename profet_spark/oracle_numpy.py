"""Pure-numpy golden oracle for the descriptor families (SURVEY.md §5.2-1).

Per-string, loop-friendly reference implementations of the ProFET-derived
descriptor math — deliberately written in the reference's own style
(one sequence at a time, [R] ProFET/feat_extract/FeatureGen.py ≈L100-600,
CTD.py, AAComposition.py, PseudoAAC.py — reconstructed, SURVEY.md §0) so
the vectorized Spark UDFs in functions/text_descriptors.py are tested
against an INDEPENDENT code path implementing the same contract.

Conventions frozen here (and replicated exactly by the engine):

- sequence = caption uppercased, non-A-Z characters removed;
- compositions normalized by len (k-mers by len-k+1); empty → 0.0;
- CTD-Distribution uses the propy quantile convention: for a class with
  m occurrences, the positions reported are those of occurrence ranks
  [1, max(1,floor(0.25m)), max(1,floor(0.5m)), max(1,floor(0.75m)), m],
  each as 1-based position / seq_len * 100 ([R] CTD.py ≈L170-230);
- windowed profile: 'valid' moving mean of the per-letter scale, window w
  ([R] FeatureGen.py ≈L320-420 via ProtParam.protein_scale);
- PseAAC-analog lag correlation: mean over i of (s[i]-s[i+d])^2
  ([R] PseudoAAC.py ≈L90-160 _GetCorrelationFunction analog).
"""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np

from profet_spark.functions.alphabets import (
    ALPHABET,
    AROMATIC,
    CTD_CLASS_MAPS,
    CTD_PROPERTIES,
    FLEX_SCALE,
    HYDRO_SCALE,
    NEGATIVE,
    POLAR,
    POSITIVE,
    R4_MAP,
    R8_MAP,
)

_NOT_ALPHA = re.compile(r"[^A-Z]")


def normalize(caption: str) -> str:
    return _NOT_ALPHA.sub("", (caption or "").upper())


def composition(seq: str) -> dict[str, float]:
    n = len(seq)
    cnt = Counter(seq)
    out = {f"comp_{c}": (cnt.get(c, 0) / n if n else 0.0) for c in ALPHABET}
    out["length"] = float(n)
    ent = 0.0
    for c, k in cnt.items():
        p = k / n
        ent -= p * math.log2(p)
    out["entropy"] = ent
    return out


def _translate(seq: str, cmap: dict[str, str]) -> str:
    return "".join(cmap[c] for c in seq)


def kmer_composition(seq: str, cmap: dict[str, str], k: int, n_groups: int, prefix: str) -> dict[str, float]:
    red = _translate(seq, cmap)
    total = max(len(red) - k + 1, 0)
    cnt = Counter(red[i : i + k] for i in range(total))
    out = {}

    def keys(k_left: int, cur: str):
        if k_left == 0:
            out[f"{prefix}_{cur}"] = (cnt.get(cur, 0) / total) if total else 0.0
            return
        for g in range(1, n_groups + 1):
            keys(k_left - 1, cur + str(g))

    keys(k, "")
    return out


def ctd(seq: str) -> dict[str, float]:
    out = {}
    n = len(seq)
    for prop in CTD_PROPERTIES:
        cmap = CTD_CLASS_MAPS[prop]
        cls = _translate(seq, cmap)
        # composition ([R] CTD.py ≈L95-130)
        for c in "123":
            out[f"ctd_{prop}_c{c}"] = (cls.count(c) / n) if n else 0.0
        # transition ([R] CTD.py ≈L130-170): unordered adjacent pairs
        nt = max(n - 1, 0)
        for a, b in (("1", "2"), ("1", "3"), ("2", "3")):
            k = sum(
                1
                for i in range(n - 1)
                if (cls[i] == a and cls[i + 1] == b) or (cls[i] == b and cls[i + 1] == a)
            )
            out[f"ctd_{prop}_t{a}{b}"] = (k / nt) if nt else 0.0
        # distribution ([R] CTD.py ≈L170-230), propy rank convention
        for c in "123":
            pos = [i + 1 for i, ch in enumerate(cls) if ch == c]
            m = len(pos)
            for q, tag in ((0.0, "001"), (0.25, "025"), (0.5, "050"), (0.75, "075"), (1.0, "100")):
                if m == 0 or n == 0:
                    v = 0.0
                else:
                    rank = 1 if q == 0.0 else (m if q == 1.0 else max(1, int(math.floor(m * q))))
                    v = pos[rank - 1] / n * 100.0
                out[f"ctd_{prop}_d{c}_{tag}"] = v
    return out


def scalars(seq: str) -> dict[str, float]:
    n = len(seq)
    if n == 0:
        return {
            "gravy": 0.0, "aromaticity": 0.0, "net_charge": 0.0,
            "frac_polar": 0.0, "flex_mean": 0.0, "instability": 0.0,
        }
    hyd = [HYDRO_SCALE[c] for c in seq]
    flx = [FLEX_SCALE[c] for c in seq]
    pos = sum(1 for c in seq if c in POSITIVE)
    neg = sum(1 for c in seq if c in NEGATIVE)
    instab = (
        sum(HYDRO_SCALE[seq[i]] * HYDRO_SCALE[seq[i + 1]] for i in range(n - 1)) / (n - 1)
        if n > 1
        else 0.0
    )
    return {
        "gravy": sum(hyd) / n,
        "aromaticity": sum(1 for c in seq if c in AROMATIC) / n,
        "net_charge": (pos - neg) / n,
        "frac_polar": sum(1 for c in seq if c in POLAR) / n,
        "flex_mean": sum(flx) / n,
        "instability": instab,
    }


def window_profile(seq: str, scale: dict[str, float], window: int, prefix: str) -> dict[str, float]:
    n = len(seq)
    if n < window:
        return {
            f"{prefix}_max": 0.0, f"{prefix}_min": 0.0, f"{prefix}_mean": 0.0,
            f"{prefix}_argmax_rel": 0.0, f"{prefix}_argmin_rel": 0.0,
        }
    vals = np.array([scale[c] for c in seq], dtype=np.float64)
    # convention: sequential left-to-right window summation, then /w —
    # chosen so the vectorized engine can reproduce it bitwise (FP ties
    # in argmax/argmin must break identically).
    p = n - window + 1
    prof = np.zeros(p, dtype=np.float64)
    for k in range(window):
        prof += vals[k : k + p]
    prof /= window
    return {
        f"{prefix}_max": float(prof.max()),
        f"{prefix}_min": float(prof.min()),
        f"{prefix}_mean": float(prof.mean()),
        f"{prefix}_argmax_rel": float(int(prof.argmax()) / len(prof)),
        f"{prefix}_argmin_rel": float(int(prof.argmin()) / len(prof)),
    }


def pseaac_corr(seq: str, lam: int = 5) -> dict[str, float]:
    vals = [HYDRO_SCALE[c] for c in seq]
    n = len(vals)
    out = {}
    for d in range(1, lam + 1):
        if n - d <= 0:
            out[f"pse_corr_{d}"] = 0.0
        else:
            out[f"pse_corr_{d}"] = sum(
                (vals[i] - vals[i + d]) ** 2 for i in range(n - d)
            ) / (n - d)
    return out


def terminal_composition(seq: str, k: int = 15) -> dict[str, float]:
    """F5 terminal segments: R8 composition of the first/last k letters
    ([R] FeatureGen.py ≈L300-380, GetSubSeq.py)."""
    out = {}
    for tag, seg in (("n", seq[:k]), ("c", seq[-k:] if seq else "")):
        m = len(seg)
        red = _translate(seg, R8_MAP)
        for g in "12345678":
            out[f"term_{tag}_{g}"] = (red.count(g) / m) if m else 0.0
    return out


FAMILIES = ("comp", "kmer2", "kmer3", "ctd", "scalar", "profile", "pseaac", "terminal")


def all_features(caption: str) -> dict[str, float]:
    """The full ProFET-analog vector for one caption (§3.2 contract)."""
    seq = normalize(caption)
    out: dict[str, float] = {}
    out.update(composition(seq))
    out.update(kmer_composition(seq, R8_MAP, 2, 8, "k2"))
    out.update(kmer_composition(seq, R4_MAP, 3, 4, "k3"))
    out.update(ctd(seq))
    out.update(scalars(seq))
    out.update(window_profile(seq, HYDRO_SCALE, 9, "prof_hyd"))
    out.update(window_profile(seq, FLEX_SCALE, 5, "prof_flex"))
    out.update(pseaac_corr(seq, 5))
    out.update(terminal_composition(seq, 15))
    return out


def feature_names() -> list[str]:
    return list(all_features("THEQUICKBROWNFOX").keys())
