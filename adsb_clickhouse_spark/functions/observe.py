"""Empty-tolerant Observation reads — shared by every metrics tap that
piggybacks a write job (the curation funnel's per-gate counters, the
text index's segment stats).

When every row of a batch is dropped upstream of a tap, AQE's
``PropagateEmptyRelation`` can prune the ``CollectMetrics`` node from
the physical plan; the ObservationManager then completes the
observation with a SCHEMALESS empty row that ``Observation.get``
cannot decode (``toPyRow`` asserts) — discovered as a stream-killer on
fully-deduplicated micro-batches (r12). The node is pruned exactly
because its input is provably EMPTY, so the caller's zero-defaults are
the exact values; anything else re-raises the original error."""

from __future__ import annotations


def observation_values(ob, defaults: dict) -> dict:
    """The observation's named metric values, or ``defaults`` iff the
    tap was pruned away by empty-relation propagation (provably-empty
    input). Any other failure re-raises."""
    try:
        row = ob.get
        return {k: row[k] for k in defaults}
    except Exception:
        # the fallback peeks at the already-completed promise via the
        # (non-public) JVM Observation; any surprise there must surface
        # the ORIGINAL error, not its own
        try:
            jo = getattr(ob, "_jo", None)
            empty = (
                jo is not None
                and jo.getRowOrEmpty().isDefined()
                and jo.getRowOrEmpty().get().length() == 0
            )
        except Exception:
            empty = False
        if empty:
            return dict(defaults)
        raise
