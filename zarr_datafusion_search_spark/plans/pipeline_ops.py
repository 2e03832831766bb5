"""Training-data pipeline operators as registry queries (filled by
operators/*; see that package for the implementations)."""

from __future__ import annotations
