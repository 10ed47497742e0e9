"""Registry entries exposing the synthetic-table generator (task 3)."""
