from mesh_navigation_tpu.cli import main

raise SystemExit(main())
