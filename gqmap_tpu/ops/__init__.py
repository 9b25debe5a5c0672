from .quadrature import gauss_hermite, build_table, QuadTable
from .interp import pad_cubic, sample_bicubic, interp2_cubic, upsample_cubic, interp2_linear, fill_missing_nearest
from .gq import gq_accumulate, finalize, gq_expectation, GQRaw, GQGrads, NODE, EDGE
from .potentials import make_node_pot_bicubic, make_node_pot_nearest, make_edge_pot, make_edge_pot_truncquad
from .simplex import project_simplex, softmax, softmax_natural_step
from .mixture import mixture_neg_pdf, mixture_mode_1d, extract_map
from .flowviz import flow_to_color, compute_color, make_colorwheel, FlowColorResult
