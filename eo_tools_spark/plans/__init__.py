"""Plan inspection + skew handling utilities."""
