from .cholesky import (cho_solve_vec_t_pallas, cholesky_pallas,  # noqa: F401
                       cholesky_t_pallas, factor_kkt_t_pallas,
                       spd_inverse, trinv_pallas)
from .lanes import (cho_solve_lanes, factor_inv_lanes,  # noqa: F401
                    factor_inv_solve_lanes, factor_kkt_lanes,
                    factor_solve_kkt_lanes, inv_solve_lanes, pad_spd_lanes)
