from tpcg.solver.api import (pcg_solve, pcg_solve_batched,
                             solve_reference_flat, PCGSolver)
