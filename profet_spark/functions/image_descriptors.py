"""Image-side descriptors (SURVEY.md §7 step 4) — filled in with the
pixel-decode pipeline; see profet_spark/imaging.py for the codec layer."""

from __future__ import annotations
