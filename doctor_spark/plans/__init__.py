"""Plan-inspection helpers (no custom Catalyst rules are needed anywhere in
this engine — see SURVEY.md §4; these utilities verify that the built-in
optimizer is doing what the scale design assumes)."""
