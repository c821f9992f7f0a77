from dsjax.ops.lstm_pallas import lstm_scan  # noqa: F401
