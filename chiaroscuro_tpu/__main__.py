from chiaroscuro_tpu.cli import main

raise SystemExit(main())
