"""Problem generators and model families: the bundled golden fixture,
random SPD systems, synthetic trajectory-optimization KKT builders
(trajopt), LQR KKT Schur-complement assembly + primal recovery (lqr_kkt),
physically-structured linearized dynamics (dynamics: double-integrator,
quadrotor hover, joint-space manipulator), nonlinear rigid-body chains via
Lagrangian autodiff (rigid_body: pendulum, approximate iiwa14-class 7-DoF
arm), the SQP outer loop with optional control bounds (sqp), and the
receding-horizon MPC warm-start loop (mpc)."""
