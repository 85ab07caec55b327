# Kaldi-style option parsing: turns `--name value` pairs into shell
# variables `name=value` (dashes mapped to underscores). Source this after
# setting defaults:   . path/to/parse_options.sh "$@"
# (the reference recipes use tools/parse_options.sh the same way).
while [ $# -gt 0 ]; do
  case "$1" in
    --*)
      name=$(echo "$1" | sed 's/^--//; s/-/_/g')
      if [ $# -lt 2 ]; then
        echo "parse_options.sh: missing value for option $1" >&2
        exit 1
      fi
      eval "${name}=\"\$2\""
      shift 2
      ;;
    *)
      echo "parse_options.sh: unexpected argument $1" >&2
      exit 1
      ;;
  esac
done
