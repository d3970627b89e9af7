from .cholesky import (cho_solve_vec_t_pallas, cholesky_pallas,  # noqa: F401
                       cholesky_t_pallas, factor_kkt_t_pallas,
                       spd_inverse, trinv_pallas)
