from .truncation import (SVDTrunc, TruncThresh, TruncBond, TruncBondMax,
                         TruncBondThresh, default_truncator)
from .tensortrain import (TensorTrain, flat_tt, rand_tt, evaluate, lognorm,
                          normalization, normalize, normalize_eachmatrix,
                          marginals, twovar_marginals, orthogonalize_left,
                          orthogonalize_right, compress, tt_sum, tt_dot,
                          bond_ranks)
from .mpem import mpem3_to_mpem2, evaluate_mpem3
