from .gqmap import (
    GQState, Problem, SweepAux, SolveResult,
    init_state, make_problem, make_sweep, make_segment_runner,
    make_map_fn, make_logp_fn, aepe_of, solve,
)
