"""SQL expression-building helpers shared across operators/queries."""

from __future__ import annotations


def let_expr(bindings, var: str, body: str) -> str:
    """Emulate a let-binding in Spark SQL: bind each (name, expr) once
    inside a single-element ``transform`` lambda; ``body`` references
    them as ``var.name`` — leaf variable reads, NOT inline copies.

    Why this exists: plain staged Projects get merged by Catalyst's
    CollapseProject, which SUBSTITUTES every alias into each of its
    consumers. A chain whose stages reference their inputs 3-4× each
    therefore grows multiplicatively — the bilinear (t, s) chain took
    ~90 s of analysis + AQE reoptimization for 27 rows when staged as
    selects. Lambda variables are opaque to the optimizer's inliner,
    keeping the expression tree LINEAR in the number of formulas.
    Used by the irregular-bilinear solve and the PQ encode/search
    expressions."""
    pairs = ", ".join(f"'{n}', {e}" for n, e in bindings)
    return (
        f"element_at(transform(array(named_struct({pairs})), "
        f"{var} -> {body}), 1)"
    )
