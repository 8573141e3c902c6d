from kgkit.cli import main

raise SystemExit(main())
