from .assignment import linear_assignment_with_limit, solve_square_lap  # noqa: F401
