"""Query plans: the analytical query surface + gold-layer materialization."""
