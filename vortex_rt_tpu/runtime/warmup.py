"""Compile-basin re-roll for the axon TPU backend.

The experimental axon compiler maps a given HLO to machine code
deterministically, but WHICH optimization basin it lands in is
effectively a lottery across innocuous program changes: the same frame
body has measured 3.6 ms, 40 ms, and 46 s per frame depending on nothing
but the surrounding program hash (docs/ARCHITECTURE.md rule 13).  With
the persistent compilation cache enabled, one bad draw becomes a
permanent artifact — and one good draw does too.

``reroll`` exploits that: it compiles the SAME burst program under
several ``tune_nonce`` values (each changes one never-reached loop-bound
constant, producing a fresh HLO hash = a fresh lottery ticket), times one
dispatch of each, installs the fastest nonce on the renderer, and leaves
its artifact in the persistent cache for every later process.
"""

from __future__ import annotations

import sys
import time
from typing import Optional


def reroll(renderer, cam, params, width: int, height: int,
           n_frames: int = 16, draws: int = 3, seed0: int = 0,
           target_ms_per_frame: Optional[float] = None,
           verbose: bool = False):
    """Try ``draws`` compile-basin nonces for the renderer's burst
    program; keep the fastest.  Returns (best_nonce, best_ms_per_frame).

    Each draw pays one compile (tens of seconds to minutes on axon) plus
    one timed dispatch; compiles are cached persistently, so re-rolling
    the same (scene-shape, size, params) in a later process is free.
    ``target_ms_per_frame`` stops early once a draw is fast enough.
    """
    best = (None, float("inf"))
    for nonce in range(draws):
        renderer.set_tune_nonce(nonce)
        t0 = time.perf_counter()
        renderer.render_burst(cam, params, width, height,
                              n_frames=n_frames, seed0=seed0,
                              rays_only=True)
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        renderer.render_burst(cam, params, width, height,
                              n_frames=n_frames, seed0=seed0 + 1,
                              rays_only=True)
        ms = (time.perf_counter() - t0) * 1e3 / n_frames
        if verbose:
            # stderr: bench.py's stdout must stay one JSON line
            print(f"reroll nonce={nonce}: compile={compile_s:.1f}s "
                  f"{ms:.2f} ms/frame", file=sys.stderr, flush=True)
        if ms < best[1]:
            best = (nonce, ms)
        if target_ms_per_frame is not None and ms <= target_ms_per_frame:
            break
    renderer.set_tune_nonce(best[0])
    return best
