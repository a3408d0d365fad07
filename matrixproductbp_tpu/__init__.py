"""matrixproductbp_tpu — TPU-native Matrix Product Belief Propagation.

A from-scratch JAX/XLA re-design (not a port) of the capabilities of
``stecrotti/MatrixProductBP.jl``: belief propagation for reweighted stochastic
dynamics on graphs, with tensor-train ("matrix product edge message") messages
over the time horizon and SVD bond truncation as the single approximation knob.

Layer map (mirrors SURVEY.md §1):
  L0  ops.tensortrain / ops.truncation / ops.mpem — padded batched TT engine
  L1  factors — BP factors as dense tables (recursive fast path + adapters)
  L2  bp — struct-of-arrays state, node-batched Jacobi sweeps, observables
  L3  exact / sampling — enumeration oracle, soft-margin sampler
  L4  models — Glauber/Ising, SIS, SIRS, heterogeneous SIS, metrics
"""

from .ops import (SVDTrunc, TruncThresh, TruncBond, TruncBondMax,
                  TruncBondThresh, default_truncator, TensorTrain, flat_tt,
                  rand_tt, evaluate, lognorm, normalization, normalize,
                  normalize_eachmatrix, marginals, twovar_marginals,
                  orthogonalize_left, orthogonalize_right, compress, tt_sum,
                  tt_dot, bond_ranks, mpem3_to_mpem2, evaluate_mpem3)
from .graph import (Graph, graph_from_edges, random_regular_graph,
                    erdos_renyi_graph, random_tree, star_graph, path_graph)
from .factors import (RecursiveFactorTables, FactorSpec, TraceFactorSpec,
                      RestrictedFactorSpec,
                      DampedFactorSpec, build_tables, build_tables_t,
                      transition_probs)
from .bp import (MPBP, mpbp, periodic_mpbp, bp_sweep, bp_sweep_chunked,
                 iterate, beliefs,
                 beliefs_tu, pair_beliefs, pair_beliefs_as_tt,
                 pair_beliefs_as_mpem, pair_lognorms, belief_lognorms,
                 bethe_free_energy_pair, bethe_free_energy, means,
                 autocorrelations, autocovariances, pair_correlations,
                 alternate_marginals, alternate_correlations, logprob,
                 expectation, reset, reset_messages, reset_beliefs,
                 reset_observations, is_periodic, is_free_dynamics, getT,
                 getN, nstates, CB_BP)
from .observations import (pair_observations_directed,
                           pair_observations_nondirected,
                           pair_obs_undirected_to_directed)
from .infinite import (infinite_regular_graph, infinite_bipartite_graph,
                       mpbp_infinite_graph, periodic_mpbp_infinite_graph,
                       mpbp_infinite_bipartite_graph,
                       bethe_free_energy_infinite_bipartite)
from .stationary import (TruncVUMPS, UniformMessage, mpbp_stationary,
                         mpbp_stationary_infinite_graph,
                         mpbp_stationary_infinite_bipartite_graph,
                         iterate_stationary, beliefs_stationary,
                         bethe_free_energy_stationary)
from .checkpoint import save_checkpoint, load_checkpoint, CheckpointManager
from .utils import mean_with_uncertainty
from . import exact
from . import sampling
from . import models
from . import parallel

# reference top-level symbols re-exported from submodules
# (src/MatrixProductBP.jl:41-71 exports the oracle/sampler surface flat)
from .exact import (exact_prob, site_marginals, exact_marginals,
                    exact_pair_marginals, exact_alternate_marginals,
                    exact_autocorrelations, exact_autocovariances,
                    exact_marginal_expectations,
                    exact_pair_marginal_expectations,
                    exact_alternate_marginal_expectations)
from .sampling import (SoftMarginSampler, sample, sample_one, marginals_mc,
                       pair_marginals_mc, means_mc, autocorrelations_mc,
                       autocovariances_mc, draw_node_observations,
                       simulate_queue_sis, continuous_sis_sampler)
from . import smc
from .smc import smc_sample

__version__ = "0.1.0"
