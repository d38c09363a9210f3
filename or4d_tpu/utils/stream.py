"""One-step lookahead pipelining for device-streaming loops.

JAX dispatch is asynchronous: a jitted call returns device futures
immediately, and only the host-side pull (``np.asarray``/scalar read) blocks.
A loop that dispatches an item and then pulls its results leaves the device
idle during every pull (and, on this environment's slow host tunnel, the
pulls are expensive). Dispatching item i+1's device work BEFORE consuming
item i's results overlaps compute/uploads with the pull while keeping at
most two items' device buffers live — the pattern behind the eval loops
(train/loop.py, serving.py) and the per-take L1 inference drivers
(pipeline/perception_infer.py).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable


def lookahead(items: Iterable, dispatch: Callable, consume: Callable) -> list:
    """For each item: ``work = dispatch(item)`` (async device work), then
    ``consume(work)`` — but item i+1 is dispatched before item i is
    consumed. Returns ``[consume(dispatch(item)) for item in items]`` with
    exactly that overlap; order of consumption matches item order."""
    out = []
    pending = None
    for item in items:
        current = dispatch(item)
        if pending is not None:
            out.append(consume(pending))
        pending = current
    if pending is not None:
        out.append(consume(pending))
    return out
