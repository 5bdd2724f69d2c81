"""CLI layer: the classification driver (replaces Main.c)."""
