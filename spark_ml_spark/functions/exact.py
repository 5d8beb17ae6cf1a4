"""Engine-exact float aggregation (both the SQL-text and DataFrame form).

Double summation is order-dependent, and every engine involved here
aggregates in parallel — the SAME engine legitimately returns sums a few
ulps apart from run to run (partial-aggregate merge order follows task
scheduling). A downstream ``ROUND(x, 2)`` amplifies ulp noise to a whole
cent whenever the sum lands on a rounding knife-edge: observed with
TPC-H Q9 at sf0.01, where Spark and DuckDB flickered between 842247.87
and 842247.88 across runs. For an oracle-hash-graded surface that is a
correctness gate failure that comes and goes.

Fix: accumulate cents-valued columns in DECIMAL(25,6). Casting each
addend quantizes the same IEEE double identically in Spark and DuckDB
(no addend of this data sits on a 6th-decimal half boundary — that needs
≤7 fractional mantissa bits, and the fixtures' prices/values carry full
double mantissas), and the decimal sum itself is exact integer
arithmetic: bit-identical across engines, partitionings, and runs, with
~1e19 headroom against these tables' ~1e11 totals. Integer-valued double
columns (quantities, counts, lengths) are already exact in IEEE and are
left untouched.

Scale note: the map-side partial aggregation shape is unchanged — this
costs a constant factor on the agg expression, not a plan change. The
factor is real and MEASURED (sf0.1, min-of-3, 600k-row hash agg):
sum(double) 0.25s; sum of quantized longs 0.17s; DECIMAL(8,2) 0.34s;
DECIMAL with a >18-digit sum buffer (this module's (25,6), like any
p>8 input — Spark's sum buffer is p+10 and leaves the long-compact
representation beyond 18) ~0.52s, i.e. ~2× on the purest agg shapes
(q_groupby_agg 0.76→2.0s end-to-end). The cheaper exact forms were
rejected on overflow math at the 100 TB target: a Q1-shaped group at
1e6× fixture scale sums ≈2.3e16 dollars = 2.3e22 scale-6 quanta —
past int64 (9.2e18) for quantized-long, and past DECIMAL(18,*)'s
buffer, while (25,6)'s 35-digit buffer holds it with headroom. This is
also precisely what Spark pays on the official TPC-H schema (DECIMAL
(15,2) columns → (25,2) sum buffers), so the bench numbers represent
honest exact-money aggregation, not an avoidable tax.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: float expressions whose SUM/AVG must accumulate exactly: cents-valued
#: price/balance/measurement columns (and aliases of their products).
EXACT_SUM_MARKERS = (
    "l_extendedprice", "o_totalprice", "c_acctbal", "s_acctbal",
    "p_retailprice", "volume", "amount", "l_discount", "value",
)

_DECIMAL = "DECIMAL(25,6)"

#: public alias for DataFrame-side partial-state casts (streaming state
#: schemas, salted-agg partials) so the accumulation type has ONE home —
#: changing precision here changes every engine-exact path at once.
DECIMAL_TYPE = _DECIMAL


def exact_sum(col: Column | str) -> Column:
    """Deterministic SUM of a cents-valued double column (DataFrame side):
    decimal accumulation, surfaced back as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DECIMAL)).cast("double")


def exact_avg(col: Column | str) -> Column:
    """Deterministic AVG: exact decimal sum / non-null count — the same
    decomposition the SQL transformer emits."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DECIMAL)).cast("double") / F.count(c)


def exact_sum_over(col: Column | str, window) -> Column:
    """Deterministic windowed SUM: engines implement sliding/range frames
    with different association orders (running fold vs segment tree), so
    even a totally-ordered frame can differ by ulps cross-engine."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(_DECIMAL)).over(window).cast("double")


def decimal_exact_sums(sql: str) -> str:
    """Rewrite ``sum(<price expr>)`` / ``avg(<price expr>)`` in SQL text
    into the exact form, identically parseable by Spark and DuckDB:

      sum(E)  ->  CAST(sum(CAST(E AS DECIMAL(25,6))) AS DOUBLE)
      avg(E)  ->  (CAST(sum(CAST(E AS DECIMAL(25,6))) AS DOUBLE) / count(E))

    Only aggregates whose argument mentions a cents-valued column
    (``EXACT_SUM_MARKERS``) are rewritten; matching is case-insensitive
    (an uppercase ``SUM(`` silently keeping the order-dependent double
    path would defeat the pass); window clauses (``sum(x) OVER ...`` and
    ``avg(x) OVER ...``, parenthesized or named) are covered — the OVER
    stays attached to each aggregate call inside the rewritten form."""
    out: list[str] = []
    lower = sql.lower()
    i = 0
    while i < len(sql):
        m = None
        for fn in ("sum(", "avg("):
            j = lower.find(fn, i)
            if j >= 0 and (m is None or j < m[0]):
                m = (j, fn)
        if m is None:
            out.append(sql[i:])
            break
        j, fn = m
        # word boundary: don't match checksum( and friends
        if j > 0 and (sql[j - 1].isalnum() or sql[j - 1] == "_"):
            out.append(sql[i:j + len(fn)])
            i = j + len(fn)
            continue
        k, depth = j + len(fn), 1
        while depth:
            if sql[k] == "(":
                depth += 1
            elif sql[k] == ")":
                depth -= 1
            k += 1
        expr = sql[j + len(fn):k - 1]
        out.append(sql[i:j])
        if not any(t in expr for t in EXACT_SUM_MARKERS):
            out.append(sql[j:k])
            i = k
            continue
        # windowed aggregate? OVER must stay attached to each aggregate
        # call, so the double-cast wraps OUTSIDE the windowed sum and the
        # avg decomposition gives BOTH the sum and the count the frame
        import re

        mo = re.match(r"\s+OVER\s+", sql[k:], re.IGNORECASE)
        if mo:
            w0 = k + mo.end()
            if sql[w0] == "(":
                w1, depth = w0 + 1, 1
                while depth:
                    if sql[w1] == "(":
                        depth += 1
                    elif sql[w1] == ")":
                        depth -= 1
                    w1 += 1
            else:  # named window: OVER w
                w1 = w0
                while w1 < len(sql) and (sql[w1].isalnum() or sql[w1] == "_"):
                    w1 += 1
            over = sql[k:w1]
            exact_w = f"CAST(sum(CAST({expr} AS {_DECIMAL})){over} AS DOUBLE)"
            if fn == "avg(":
                out.append(f"({exact_w} / count({expr}){over})")
            else:
                out.append(exact_w)
            i = w1
            continue
        exact = f"CAST(sum(CAST({expr} AS {_DECIMAL})) AS DOUBLE)"
        if fn == "avg(":
            out.append(f"({exact} / count({expr}))")
        else:
            out.append(exact)
        i = k
    return "".join(out)
