"""Text/string column expressions (SURVEY.md §2.8 string family)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

ETH_ADDRESS_RE = r"^0x[a-fA-F0-9]{40}$"


def is_eth_address(col: Column | str) -> Column:
    """P10: ETH address format predicate (`validate.py:142-146`)."""
    col = F.col(col) if isinstance(col, str) else col
    return col.rlike(ETH_ADDRESS_RE)


def shorten_address(col: Column | str, head: int = 6, tail: int = 4) -> Column:
    """Display shortening `0x1234…abcd` (`generate_visualizations.py:
    244,253` slices head/tail of the address string)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.concat(
        F.substring(col, 1, head),
        F.lit("..."),
        col.substr(F.length(col) - tail + 1, F.lit(tail)),
    )


def normalize_whitespace(col: Column | str) -> Column:
    """Lowercase + collapse whitespace + trim — the shared normalization
    of every text-dedup path (`operators.dedup._norm_text`)."""
    col = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
