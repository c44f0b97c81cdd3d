"""elementalx — TPU-native distributed dense linear algebra.

A from-scratch rebuild of Elemental/Hydrogen (reference: /root/reference,
LLNL Hydrogen fork of Elemental 1.2.0) designed for TPU: the process Grid
is a jax.sharding Mesh, matrix distributions are shardings, every
redistribution is an XLA collective over ICI, and local block compute runs
on the MXU via XLA ops and Pallas kernels. See SURVEY.md for the layer map.

The public surface mirrors El:: names but is functional (ops return new
DistMatrices) as JAX requires.
"""

__version__ = "0.1.0"

import os as _os

import jax as _jax

# LAPACK-grade accuracy is this library's contract: on TPU the default
# matmul precision demotes f32 operands to bf16 (2^-8-grade), which is
# catastrophic for factorizations. Opt out (e.g. for ML-style pipelines
# embedding elementalx) with ELEMENTALX_NO_PRECISION_OVERRIDE=1.
if not _os.environ.get("ELEMENTALX_NO_PRECISION_OVERRIDE"):
    _jax.config.update("jax_default_matmul_precision", "highest")

# Persistent compilation cache: factorization graphs are large and the
# attached-TPU tunnel compiles slowly; cached programs make reruns fast.
# Opt out with ELEMENTALX_NO_COMPILE_CACHE=1.
_platforms = _os.environ.get("JAX_PLATFORMS", "").lower()
# a script may pin the platform via jax.config BEFORE importing
# elementalx (the only override the axon plugin respects) — honour it
_cfg_platforms = str(getattr(_jax.config, "jax_platforms", "") or "").lower()
if _cfg_platforms:
    _platforms = _cfg_platforms
if not _os.environ.get("ELEMENTALX_NO_COMPILE_CACHE") and \
        _platforms and "cpu" not in _platforms:
    # Cache ONLY when a non-CPU platform is explicitly named (axon/tpu
    # sessions set JAX_PLATFORMS). An unset var can still resolve to the
    # CPU backend, where the cache must stay off (see below) — so unset
    # means no cache rather than guessing the backend eagerly.
    # CPU-platform sessions (the test suite) run UNCACHED: XLA:CPU
    # segfaults (de)serializing very large executables on some hosts —
    # observed in both put_executable_and_time and
    # get_executable_and_time for the fuzz-eig program. The cache's real
    # value is the slow attached-TPU tunnel compiles, which keep it.
    try:
        # key the cache by the host CPU profile: XLA:CPU AOT executables
        # serialized on a host with different vector features SEGFAULT on
        # deserialization (observed across container reschedules), so a
        # rescheduled host must get a fresh cache directory
        def _host_tag():
            import hashlib

            try:
                with open("/proc/cpuinfo") as fh:
                    for line in fh:
                        if line.startswith("flags"):
                            return hashlib.sha1(
                                line.encode()).hexdigest()[:10]
            except OSError:
                pass
            return "generic"

        _cache = _os.environ.get(
            "ELEMENTALX_CACHE_DIR",
            _os.path.expanduser("~/.cache/elementalx_xla_" + _host_tag()))
        _jax.config.update("jax_compilation_cache_dir", _cache)
        _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

from .core import *  # noqa: F401,F403
from .core import redistribute as copy  # noqa: F401  (the copy:: namespace)
from . import blas  # noqa: F401
from .blas import (  # noqa: F401
    Gemm,
    Gemv,
    Hemm,
    Her2k,
    Herk,
    Symm,
    Syr2k,
    Syrk,
    Trmm,
    Trsm,
    Trsv,
)
from . import lapack  # noqa: F401
from .lapack import (  # noqa: F401
    Cholesky,
    Condition,
    Determinant,
    FrobeniusNorm,
    HPDSolve,
    HermitianEig,
    HermitianTridiag,
    InfinityNorm,
    Inverse,
    LDL,
    LinearSolve,
    LQ,
    LU,
    MaxNorm,
    OneNorm,
    Polar,
    Pseudoinverse,
    QR,
    SVD,
    Sign,
    SingularValues,
    SquareRoot,
    Trace,
    TwoNorm,
)
from . import matrices  # noqa: F401,E402
from . import io_  # noqa: F401,E402
io = io_  # noqa: E402  (reference namespace: El.io / El::Display)
from .io_ import Display, Print, Spy  # noqa: F401,E402
from . import control  # noqa: F401,E402
from . import sparse  # noqa: F401,E402
from . import optimization  # noqa: F401,E402
from . import utils  # noqa: F401,E402
from . import kernels  # noqa: F401,E402
from . import native  # noqa: F401,E402

# The reference's namespace is flat (everything lives in El::). Mirror
# that: lift every public blas/lapack entry point to the package root,
# never overriding a name already bound above (e.g. Trace stays the
# lapack props version, exactly like the curated imports).
for _mod in (blas, lapack):
    for _name, _obj in vars(_mod).items():
        if _name[:1].isupper() and callable(_obj) \
                and not hasattr(_mod, "__" + _name):
            globals().setdefault(_name, _obj)
del _mod, _name, _obj
