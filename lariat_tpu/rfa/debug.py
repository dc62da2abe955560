"""Debug switches: reference ``-debugPrintMove`` move-by-move dumps.

The reference prints diagnostics from inside fastScore / the MAPQ pass when
the flag is set (lariat.go:876, 1189-1304). Set PRINT_MOVE before worker
processes fork (the CLI does) so every worker inherits it.
"""

PRINT_MOVE = False
