from insarseg.utils.history import save_history, sanitize_history  # noqa: F401
