from raykg.cli import main

raise SystemExit(main())
