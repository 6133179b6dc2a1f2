"""Native (C) host-runtime kernels with pure-Python fallbacks."""

from amira_tpu.native.build import build, load  # noqa: F401
