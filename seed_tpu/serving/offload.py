"""Host<->device parameter offload — fit the whole 8B demo on one chip.

The reference's headline serving trick is dynamic offload: the visual
tokenizer and the diffusion de-tokenizer live on CPU and are moved onto
the (16GB) accelerator only for the duration of an encode/decode call, so
the 8B language model keeps the device to itself
(gradio_demo/seed_llama_flask.py:53-84 offload flags, :125-130 encoder
swap to cuda/cpu, :205-209 diffusion swap).

The TPU-native equivalent: params are pinned on the host CPU device;
``acquire()`` streams them into HBM with ``jax.device_put``; ``release()``
explicitly deletes the device buffers (dropping the reference is not
enough — deletion must be deterministic, the next prefill needs the HBM
*now*). The jitted compute functions are unchanged: they take params as
arguments, so swapped-in copies flow through the same compiled programs.

Sync contract: callers MUST materialize results on host (``np.asarray``)
before ``release()`` — on the axon tunnel ``block_until_ready`` returns
early, and deleting input buffers under an in-flight execution is
undefined. Every seed_tpu serving call site already syncs through its
host transfer.
"""
from __future__ import annotations

from typing import Any, Optional

import jax


def _cpu_device():
    return jax.local_devices(backend="cpu")[0]


class OffloadedParams:
    """A param pytree pinned on host, swappable onto the compute device.

    Usage::

        off = OffloadedParams(params)          # pins to host CPU
        with off as p:                         # device_put -> HBM
            out = np.asarray(jitted_fn(p, x))  # sync BEFORE exit
        # device buffers deleted; HBM free again

    Re-entrant ``with`` blocks share one device copy (refcounted), so a
    decode loop that calls encode_image per request under an outer
    acquire pays one swap, not N.
    """

    def __init__(self, params: Any, device=None, host=None):
        self.host_device = host or _cpu_device()
        self.device = device
        self.params = jax.device_put(params, self.host_device)
        jax.block_until_ready(self.params)   # host transfer: trustworthy
        self._live: Optional[Any] = None
        self._alias = False  # device == host (CPU tests): no copy was made
        self._depth = 0
        self.swap_count = 0     # host->device transfers (tests/telemetry)

    @property
    def resident(self) -> bool:
        return self._live is not None

    @property
    def nbytes(self) -> int:
        return sum(x.nbytes for x in jax.tree.leaves(self.params))

    def acquire(self) -> Any:
        if self._live is None:
            dev = self.device or jax.devices()[0]
            # same-device "swap" (CPU test meshes): device_put aliases the
            # host buffers instead of copying — deleting them on release
            # would destroy the pinned copy, so mark and skip deletion
            self._alias = dev == self.host_device
            self._live = (self.params if self._alias
                          else jax.device_put(self.params, dev))
            self.swap_count += 1
        self._depth += 1
        return self._live

    def release(self) -> None:
        if self._depth > 0:
            self._depth -= 1
        if self._depth == 0 and self._live is not None:
            if not self._alias:
                for leaf in jax.tree.leaves(self._live):
                    leaf.delete()
            self._live = None

    def __enter__(self) -> Any:
        return self.acquire()

    def __exit__(self, *exc) -> None:
        self.release()


class ResidentParams:
    """No-op stand-in with the same interface, for offload=False paths —
    call sites write one code path and the flag decides the behavior."""

    def __init__(self, params: Any, device=None):
        self.params = (params if device is None
                       else jax.device_put(params, device))
        self.swap_count = 0

    @property
    def resident(self) -> bool:
        return True

    def acquire(self) -> Any:
        return self.params

    def release(self) -> None:
        pass

    def __enter__(self) -> Any:
        return self.params

    def __exit__(self, *exc) -> None:
        pass


def wrap_params(params: Any, offload: bool, device=None):
    """OffloadedParams when ``offload`` else ResidentParams."""
    return (OffloadedParams(params, device=device) if offload
            else ResidentParams(params))
