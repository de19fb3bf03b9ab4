"""Training-data pipeline operators (SURVEY.md §2.4): dedup, similarity,
text analysis, multimodal. Populated module-by-module; each query follows
the determinism policy in base.py."""

from __future__ import annotations
