"""Ray Data pipeline stages: extract → link → canonicalize → materialize."""
