"""The five model programs (≈ reference model/*.c + main.c), each exposing
``init | train | run`` CLI verbs with the reference's positional semantics."""
