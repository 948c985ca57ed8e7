"""Cross-engine-stable numeric quantization.

``ROUND(x, d)`` is NOT portable across engines when x sits exactly on a
decimal boundary: Spark rounds the exact binary expansion with BigDecimal
HALF_UP while DuckDB multiply-shifts in floating point, and e.g.
``round(74.57 * 2.5, 2)`` comes out 186.42 vs 186.43.  Every rounded value
the engine emits (and every oracle-SQL twin) therefore uses the same
explicit IEEE formula instead:

    floor(x * 10^d + 0.5) / 10^d

Identical inputs then produce bitwise-identical doubles on any engine,
because every step is a deterministic IEEE-754 operation.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

def qround(col: Column | str, decimals: int = 6) -> Column:
    """Quantize a double to ``decimals`` places, half-up, engine-stable."""
    c = F.col(col) if isinstance(col, str) else col
    scale = float(10**decimals)
    return F.floor(c * F.lit(scale) + F.lit(0.5)) / F.lit(scale)

def qround_sql(expr: str, decimals: int = 6) -> str:
    """The same quantization as ANSI SQL text for DuckDB oracle twins."""
    scale = float(10**decimals)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"
