from tpcg.solver.api import (pcg_solve, pcg_solve_batched,
                             pcg_solve_multirhs,
                             solve_reference_flat, PCGSolver)
