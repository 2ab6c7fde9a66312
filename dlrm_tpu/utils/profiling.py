"""Profiling: Chrome/Perfetto traces + named regions.

Replaces the reference's torch.autograd.profiler integration
(dlrm_s_pytorch.py:1513-1515 wrap of the train loop, :1794-1806 table +
chrome-trace export; record_function region labels :130, :552, :565, :572,
:576, :1604) with jax.profiler: traces carry the same region names via
jax.named_scope and are written as a Perfetto/TensorBoard-loadable trace
directory.
"""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional

import jax

# Region labels kept verbatim from the reference so existing trace-analysis
# tooling/expectations carry over.
FWD = "DLRM forward"
EMB_FWD = "DLRM embedding forward"
BOT_FWD = "DLRM bottom nlp forward"
INT_FWD = "DLRM interaction forward"
TOP_FWD = "DLRM top nlp forward"
LOSS = "DLRM loss compute"
BWD = "DLRM backward"


@contextlib.contextmanager
def profile(enabled: bool, output_dir: str = "dlrm_profile") -> Iterator[None]:
    """Context manager around a training run; writes a trace directory that
    TensorBoard / Perfetto / xprof can open (the chrome-trace analog of
    dlrm_s_pytorch.py:1794-1806)."""
    if not enabled:
        yield
        return
    os.makedirs(output_dir, exist_ok=True)
    jax.profiler.start_trace(output_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {output_dir}")


scope = jax.named_scope
