"""lapack_like layer (reference: src/lapack_like/, SURVEY §2.4)."""

from . import cholesky  # noqa: F401
from .cholesky import (  # noqa: F401
    Cholesky,
    CholeskyMod,
    HPDSolve,
    ReverseCholesky,
)
from . import lu  # noqa: F401
from .lu import LU, LUFullPiv, LUMod, LinearSolve  # noqa: F401
from . import perm  # noqa: F401
from .perm import Permutation  # noqa: F401
from . import qr  # noqa: F401
from .qr import QR, ApplyQ, CholeskyQR, ColPivQR, ExplicitQR, TSQR  # noqa: F401
from . import lq  # noqa: F401
from .lq import LQ, ExplicitLQ, ExplicitRQ  # noqa: F401
from . import ldl  # noqa: F401
from .ldl import (LDL, Inertia, RegularizedLDL,  # noqa: F401
                  RegularizedSolveAfter, LDLPivoted, SolveAfterPivoted,
                  InertiaAfterLDL)
from . import reflect  # noqa: F401
from . import condense  # noqa: F401
from .condense import Bidiag, Hessenberg, HermitianTridiag  # noqa: F401
from . import tridiag_eig  # noqa: F401
from .tridiag_eig import HermitianTridiagEig  # noqa: F401
from . import hermitian_eig  # noqa: F401
from .hermitian_eig import (  # noqa: F401
    HermitianEig,
    HermitianEigCtrl,
    HermitianGenDefEig,
    SkewHermitianEig,
)
from . import polar  # noqa: F401
from .polar import HermitianPolar, Polar  # noqa: F401
from . import svd  # noqa: F401
from .svd import SVD, BidiagSVD, HermitianSVD, SingularValues  # noqa: F401
from . import props  # noqa: F401
from .props import (  # noqa: F401
    Condition,
    Determinant,
    EntrywiseNorm,
    FrobeniusNorm,
    HPDDeterminant,
    InfinityNorm,
    KyFanNorm,
    KyFanSchattenNorm,
    HermitianKyFanSchattenNorm,
    SymmetricKyFanSchattenNorm,
    HermitianNorm,
    MaxNorm,
    Norm,
    NuclearNorm,
    OneNorm,
    SchattenNorm,
    SymmetricMaxNorm,
    SymmetricNorm,
    HermitianFrobeniusNorm,
    HermitianMaxNorm,
    HermitianEntrywiseNorm,
    HermitianNuclearNorm,
    HermitianSchattenNorm,
    HermitianKyFanNorm,
    HermitianTwoNorm,
    HermitianTwoNormEstimate,
    SymmetricFrobeniusNorm,
    SymmetricEntrywiseNorm,
    SymmetricNuclearNorm,
    SymmetricSchattenNorm,
    SymmetricKyFanNorm,
    SymmetricTwoNorm,
    SymmetricTwoNormEstimate,
    SafeDeterminant,
    Trace,
    TwoNorm,
    TwoNormEstimate,
    ZeroNorm,
)
from . import funcs  # noqa: F401
from .funcs import (  # noqa: F401
    HermitianFunction,
    HermitianInverse,
    HermitianPseudoinverse,
    HermitianSign,
    HPSDCholesky,
    HPDInverse,
    HPSDSquareRoot,
    Inverse,
    Pseudoinverse,
    Sign,
    SquareRoot,
    SymmetricInverse,
    TriangularInverse,
)
from . import euclidean_min  # noqa: F401
from .euclidean_min import GLM, LSE, LeastSquares, Ridge, Tikhonov  # noqa: F401
from . import solve  # noqa: F401
from .gmres import FGMRES, LGMRES  # noqa: F401
from .solve import (  # noqa: F401
    HermitianSolve,
    MultiShiftHessSolve,
    SQSDSolve,
    SymmetricSolve,
)
from . import equilibrate  # noqa: F401
from .equilibrate import (GeomEquil, RuizEquil,  # noqa: F401
                          SymmetricRuizEquil, SymmetricGeomEquil,
                          SymmetricDiagonalEquil)
from . import util  # noqa: F401
from .util import (ApplyTaggedSortToEachColumn,  # noqa: F401
                   ApplyTaggedSortToEachRow, Median, Sort, SortColumns,
                   SortingPermutation, TaggedSort)
from . import id_skeleton  # noqa: F401
from .id_skeleton import ID, Skeleton  # noqa: F401
from . import schur  # noqa: F401
from .schur import (  # noqa: F401
    Eig,
    HessenbergEig,
    HessenbergSchur,
    QuasiSchurDecomposition,
    QuasiTriangEig,
    ReorderSchur,
    Schur,
    SchurSwap,
    TriangEig,
)
from . import schur_real  # noqa: F401
from .schur_real import CheckRealSchur, SchurRealToComplex  # noqa: F401
from . import pseudospectra  # noqa: F401
from .pseudospectra import (Pseudospectra, TriangularPseudospectra,  # noqa: F401
                            OneNormPseudospectra,
                            SpectralPortrait, SpectralWindow, SpectralCloud,
                            TriangularSpectralPortrait,
                            TriangularSpectralWindow,
                            TriangularSpectralCloud,
                            QuasiTriangularSpectralPortrait,
                            QuasiTriangularSpectralWindow,
                            QuasiTriangularSpectralCloud,
                            HessenbergSpectralPortrait,
                            HessenbergSpectralWindow,
                            HessenbergSpectralCloud)
from . import lanczos  # noqa: F401
from .lanczos import (Lanczos, LanczosDecomp,  # noqa: F401
                      ProductLanczos, ProductLanczosDecomp)
from . import secular  # noqa: F401
from .secular import CubicSecular, SecularEVD, SecularSVD  # noqa: F401
from . import gqr  # noqa: F401
from .gqr import GQR, GRQ  # noqa: F401
from .hermitian_eig import (  # noqa: F401
    HermitianEigSDC,
    HermitianEigSubset,
    HermitianEigValueSubset,
)
from .cholesky import CholeskyPivoted  # noqa: F401
from . import image_kernel  # noqa: F401
from .image_kernel import Image, ImageAndKernel, Kernel  # noqa: F401
from . import tridiag_dc  # noqa: F401
from .tridiag_dc import HermitianTridiagEigDC, tridiag_eig_dc  # noqa: F401
from . import refine  # noqa: F401
from .refine import RefinedHPDSolve, RefinedLinearSolve  # noqa: F401
