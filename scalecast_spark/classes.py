"""Import-compatibility with the reference's ``scalecast.classes``
(reference src/scalecast/classes.py): the small value types ported
scripts construct directly. Only the types with engine-side meaning
ship — AR (regressor-name token) and MetricStore (custom-metric
descriptor); the reference's sklearn plumbing types (NoScaler,
ValidatedList) have no Spark counterpart by design.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class AR:
    """Autoregressive-term token (reference classes.py:80-91). The
    reference keys current_xreg with AR objects; the engine names lag
    columns ``ar_<k>``, so equality is defined against BOTH spellings —
    ``AR(12) in f.get_regressor_names()`` works on ported asserts."""

    lag_order: int

    def __str__(self) -> str:
        return f"ar_{self.lag_order}"

    def __eq__(self, other) -> bool:
        if isinstance(other, AR):
            return self.lag_order == other.lag_order
        if isinstance(other, str):
            return other in (f"ar_{self.lag_order}", f"AR{self.lag_order}")
        return NotImplemented

    def __hash__(self) -> int:
        return hash(("AR", self.lag_order))


@dataclass
class MetricStore:
    """Custom-metric descriptor (reference classes.py:26-49). The
    engine evaluates metrics as DISTRIBUTED SQL aggregates, so a
    registrable MetricStore needs an ``expr`` — a callable
    ``(actual_col: str, forecast_col: str) -> Column`` aggregate —
    alongside (or instead of) the reference's array-level
    ``eval_func``. ``register()`` installs it in
    functions.metrics.METRIC_EXPRS; Forecaster.set_metrics accepts
    the object directly and registers it on the way in. An
    expr-less store raises with guidance instead of silently
    collecting every row to the driver."""

    name: str
    eval_func: callable = None
    lower_is_better: bool = True
    min_obs_required: int = 1
    expr: callable = field(default=None)

    def register(self) -> "MetricStore":
        from scalecast_spark.functions import metrics as M

        if self.expr is None:
            raise TypeError(
                f"MetricStore({self.name!r}) has no `expr`: the engine "
                "evaluates metrics as distributed SQL aggregates, so a "
                "custom metric registers a Column-expression builder "
                "(actual, forecast) -> Column — e.g. expr=lambda a, f: "
                "(F.sqrt(F.avg(F.pow(F.col(f) - F.col(a), 2))) + "
                "F.avg(F.abs(F.col(f) - F.col(a)))) / 2. The reference's "
                "array eval_func would force a driver-side collect of "
                "every scored row."
            )
        M.METRIC_EXPRS[self.name] = self.expr
        M.LOWER_IS_BETTER[self.name] = self.lower_is_better
        return self
