from wicca_tpu.cli import main

raise SystemExit(main())
