"""Alphabets, property classes, and numeric scales (SURVEY.md §2 C1, §1.1).

The reference builds 20-letter→k-letter translation tables
(``TransDict_from_list``, [R] ProFET/feat_extract/AAlphabets.py ≈L10-60 —
reconstructed, SURVEY.md §0) and per-letter numeric property dicts
([R] CTD.py ≈L25-90; propy lineage). Our "sequence" is caption text
normalized to the 26-letter A-Z alphabet, so every table here covers all
26 letters:

- the seven 3-class CTD property partitions keep propy's published
  amino-acid groupings for the 20 AA letters (public propy/ProFET
  knowledge) and assign the six non-AA letters (B J O U X Z) to class 2;
- the numeric hydropathy scale is Kyte-Doolittle (public, Biopython
  ProtParamData) extended with 0.0 for non-AA letters;
- reduced alphabets R8/R4 are our documented analogs of ProFET's
  ``ofer8``-style groupings.

Everything is exported both as python dicts (for numpy oracle + pandas
UDFs) and as ``(src, dst)`` translate strings (for JVM-side
``F.translate`` and for ANSI-SQL ``translate`` oracles).
"""

from __future__ import annotations

import numpy as np

ALPHABET = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
NON_AA = set("BJOUXZ")

# --- CTD 3-class property partitions (propy convention, classes '1'/'2'/'3')

_CTD_GROUPS = {
    "hydrophobicity": ("RKEDQN", "GASTPHY", "CLVIMFW"),
    "vdw_volume": ("GASTCPD", "NVEQIL", "MHKFRYW"),
    "polarity": ("LIFWCMVY", "PATGS", "HQRKNED"),
    "charge": ("KR", "ANCQGHILMFPSTWYV", "DE"),
    "secondary_str": ("EALMQKRH", "VIYCWFT", "GNPSD"),
    "solvent_acc": ("ALFCGIVW", "RKQEND", "MPSTHY"),
    "polarizability": ("GASDT", "CPNVEQIL", "KMHFRYW"),
}

CTD_PROPERTIES = tuple(_CTD_GROUPS)


def _class_map(groups: tuple[str, str, str]) -> dict[str, str]:
    m = {c: "2" for c in NON_AA}  # non-AA letters → neutral class
    for cls, letters in zip("123", groups):
        for c in letters:
            m[c] = cls
    if len(m) != 26:
        raise ValueError(f"alphabet groups do not cover a-z: {groups}")
    return m


CTD_CLASS_MAPS: dict[str, dict[str, str]] = {p: _class_map(g) for p, g in _CTD_GROUPS.items()}

# --- reduced alphabets (ofer8-style analogs, documented partitions of A-Z)

REDUCED_8 = {
    "1": "AG", "2": "ST", "3": "LVIM", "4": "FWY",
    "5": "KRH", "6": "DE", "7": "NQ", "8": "CPBJOUXZ",
}
REDUCED_4 = {
    "1": "AGSTP", "2": "LVIMCFWY", "3": "KRHDENQ", "4": "BJOUXZ",
}


def reduced_map(groups: dict[str, str]) -> dict[str, str]:
    m = {}
    for digit, letters in groups.items():
        for c in letters:
            m[c] = digit
    if len(m) != 26:
        raise ValueError("alphabet groups do not cover a-z")
    return m


R8_MAP = reduced_map(REDUCED_8)
R4_MAP = reduced_map(REDUCED_4)


def translate_pair(char_map: dict[str, str]) -> tuple[str, str]:
    """(src, dst) strings for F.translate / SQL translate."""
    return ALPHABET, "".join(char_map[c] for c in ALPHABET)


# --- numeric per-letter scales

# Kyte-Doolittle hydropathy (public; Biopython ProtParamData.kd), non-AA → 0.
KYTE_DOOLITTLE = {
    "A": 1.8, "R": -4.5, "N": -3.5, "D": -3.5, "C": 2.5, "Q": -3.5,
    "E": -3.5, "G": -0.4, "H": -3.2, "I": 4.5, "L": 3.8, "K": -3.9,
    "M": 1.9, "F": 2.8, "P": -1.6, "S": -0.8, "T": -0.7, "W": -0.9,
    "Y": -1.3, "V": 4.2,
}
HYDRO_SCALE = {c: KYTE_DOOLITTLE.get(c, 0.0) for c in ALPHABET}

# Normalized flexibility analog (public Vihinen-scale lineage, rescaled to
# mean≈1): used for the second windowed profile (W1).
_FLEX_BASE = {
    "A": 0.984, "C": 0.906, "D": 1.068, "E": 1.094, "F": 0.915, "G": 1.031,
    "H": 0.950, "I": 0.927, "K": 1.102, "L": 0.935, "M": 0.952, "N": 1.048,
    "P": 1.049, "Q": 1.037, "R": 1.008, "S": 1.046, "T": 0.997, "V": 0.931,
    "W": 0.904, "Y": 0.929,
}
FLEX_SCALE = {c: _FLEX_BASE.get(c, 1.0) for c in ALPHABET}

# --- Grantham (1974, Science 185:862) amino-acid difference formula:
# d_ij = rho * sqrt(alpha*(c_i-c_j)^2 + beta*(p_i-p_j)^2 + gamma*(v_i-v_j)^2)
# with the published composition (c), polarity (p) and side-chain volume
# (v) values and constants alpha=1.833, beta=0.1018, gamma=0.000399,
# rho=50.723 (mean distance normalized to ~100). This is the _Distance2
# matrix of upstream quasi-sequence-order ([R] QuasiSequenceOrder.py
# ≈L60-300, propy lineage) — reconstructed here from the PAPER's formula
# + property table (all public), not copied as a 400-constant dump, so
# the data entry is checksummable: round(d) reproduces the published
# integer distances (Leu-Ile 5, Gly-Trp 184, ...) and the 190-pair mean
# is ~100 (pinned in tests/test_descriptors.py). Non-AA letters (BJOUXZ)
# take each property's rounded 20-AA mean — the distortion-minimizing
# neutral, same convention as the other scales' defaults.
_GRANTHAM_BASE = {
    #      c      p      v
    "A": (0.00,  8.1,  31.0), "R": (0.65, 10.5, 124.0),
    "N": (1.33, 11.6,  56.0), "D": (1.38, 13.0,  54.0),
    "C": (2.75,  5.5,  55.0), "Q": (0.89, 10.5,  85.0),
    "E": (0.92, 12.3,  83.0), "G": (0.74,  9.0,   3.0),
    "H": (0.58, 10.4,  96.0), "I": (0.00,  5.2, 111.0),
    "L": (0.00,  4.9, 111.0), "K": (0.33, 11.3, 119.0),
    "M": (0.00,  5.7, 105.0), "F": (0.00,  5.2, 132.0),
    "P": (0.39,  8.0,  32.5), "S": (1.42,  9.2,  32.0),
    "T": (0.71,  8.6,  61.0), "W": (0.13,  5.4, 170.0),
    "Y": (0.20,  6.2, 136.0), "V": (0.00,  5.9,  84.0),
}
GRANTHAM_ALPHA, GRANTHAM_BETA, GRANTHAM_GAMMA = 1.833, 0.1018, 0.000399
GRANTHAM_RHO = 50.723

# exact-int encodings (c x100, p x10, v x10) — tau sums SQUARED distances,
# and d^2/rho^2 * 1e8 = 18330*dc100^2 + 101800*dp10^2 + 399*dv10^2 is a
# pure integer expression, bitwise-portable across engines
_g_c100 = {c: int(round(v[0] * 100)) for c, v in _GRANTHAM_BASE.items()}
_g_p10 = {c: int(round(v[1] * 10)) for c, v in _GRANTHAM_BASE.items()}
_g_v10 = {c: int(round(v[2] * 10)) for c, v in _GRANTHAM_BASE.items()}


def _with_mean_default(m: dict[str, int]) -> dict[str, int]:
    neutral = int(round(sum(m.values()) / len(m)))
    return {c: m.get(c, neutral) for c in ALPHABET}


GRANTHAM_C100 = _with_mean_default(_g_c100)
GRANTHAM_P10 = _with_mean_default(_g_p10)
GRANTHAM_V10 = _with_mean_default(_g_v10)


def grantham_d2_scaled(a: str, b: str) -> int:
    """Exact-int d^2/rho^2 * 1e8 between two letters (A-Z)."""
    dc = GRANTHAM_C100[a] - GRANTHAM_C100[b]
    dp = GRANTHAM_P10[a] - GRANTHAM_P10[b]
    dv = GRANTHAM_V10[a] - GRANTHAM_V10[b]
    return 18330 * dc * dc + 101800 * dp * dp + 399 * dv * dv


def grantham_distance(a: str, b: str) -> float:
    """The Grantham distance itself (float; checksum/report form)."""
    return GRANTHAM_RHO * (grantham_d2_scaled(a, b) / 1e8) ** 0.5


AROMATIC = set("FWYH")
POSITIVE = set("KRH")
NEGATIVE = set("DE")
POLAR = set("RKEDQN")


def scale_lut(scale: dict[str, float]) -> np.ndarray:
    """256-entry float64 lookup table indexed by ASCII code (0 elsewhere)."""
    lut = np.zeros(256, dtype=np.float64)
    for c, v in scale.items():
        lut[ord(c)] = v
    return lut


def class_lut(char_map: dict[str, str]) -> np.ndarray:
    """256-entry int64 LUT: letter → class digit (0 for non-alphabet)."""
    lut = np.zeros(256, dtype=np.int64)
    for c, v in char_map.items():
        lut[ord(c)] = int(v)
    return lut


def set_lut(chars: set[str]) -> np.ndarray:
    lut = np.zeros(256, dtype=bool)
    for c in chars:
        lut[ord(c)] = True
    return lut
