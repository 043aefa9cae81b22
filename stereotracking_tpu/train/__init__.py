from . import losses, schedules, train_state  # noqa: F401
