from .bcs import Dirichlet, Flux, Neumann, NoFlux, merge_boundary_conditions
from .vertical_ops import (apply_flux_bcs, div_faces, ghosts, grad_faces,
                           interp_faces_mid, interp_faces_min)
