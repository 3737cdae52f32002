"""Problem generators: the bundled golden fixture, random SPD systems, and
trajectory-optimization KKT builders (quadrotor / iiwa14 scales)."""
