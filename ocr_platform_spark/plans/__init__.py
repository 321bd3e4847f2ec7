"""End-to-end jobs composing operators into pipelines."""
