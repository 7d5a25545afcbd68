/* Independent C oracle twin — cross-anchors the Python f64 oracle.
 *
 * The reference's defining claim is cross-implementation bit-exactness
 * ("exactly the same outputs as the C version given the parameters and
 * random seed", /root/reference/README.md:9; pinned repro
 * /root/reference/package.json:10).  No node/bun or real checkpoint exists
 * in this environment, so the repo's golden fixtures were anchored only to
 * its own statement-by-statement float64 oracle (compat/oracle.py) —
 * self-anchored.  This file is a SECOND, independent implementation of the
 * same numeric contract (VERDICT r3 next-step #5), written in C from
 * SURVEY.md's spec of llama2.ts:205-303 (forward), :305-344 (BPE),
 * :348-394 (RNG + samplers), :460-511 (generation loop), sharing zero code
 * with the Python oracle.  tests/test_native_oracle.py asserts the two
 * agree token-for-token on the repro config at the stories15M shape; two
 * independent implementations agreeing upgrades the anchor from
 * self-checked to cross-checked.
 *
 * Numeric contract (JS numbers are IEEE float64; Float32Array stores are
 * the only f32 rounding points):
 *   - every accumulation (matmul dots, rmsnorm sum, softmax sum, attention
 *     scores and value sums, residual adds) runs in double;
 *   - every store into an activation buffer rounds once to float;
 *   - exp/sqrt are the C library doubles (same as JS Math.exp/sqrt).
 *
 * Usage:
 *   oracle model.bin tokenizer.bin [-s seed] [-t temp] [-p topp]
 *          [-n steps] [-i prompt]
 * Prints one chosen token id per line (prompt-forced + sampled, stopping
 * BEFORE the BOS terminator) — the exact stream generate_compat returns.
 *
 * Scope note: the BPE encoder compares RAW token bytes, which is identical
 * to the reference's decoded-string indexOf for ASCII prompts (any invalid
 * UTF-8 byte decodes to U+FFFD != ASCII; valid multi-byte sequences decode
 * to non-ASCII).  Non-ASCII prompt bytes exit with an error rather than
 * risk divergence — the repro config ("Once upon a time") is ASCII.
 */

#include <math.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>

/* ---------------- config + weights (llama2.c v0 checkpoint) ------------- */

typedef struct {
    int dim, hidden_dim, n_layers, n_heads, n_kv_heads, vocab_size, seq_len;
    int shared_weights; /* vocab_size sign trick (llama2.ts:87-90) */
    int head_size, kv_dim, gs; /* derived; gs = query heads per kv head */
} Config;

typedef struct {
    float *token_embedding; /* (vocab, dim) */
    float *rms_att;         /* (L, dim) */
    float *wq, *wk, *wv, *wo;
    float *rms_ffn;
    float *w1, *w2, *w3;
    float *rms_final;
    float *freq_cis_real, *freq_cis_imag; /* (seq_len, head_size/2) */
    float *wcls;
} Weights;

static void *xmalloc(size_t n) {
    void *p = malloc(n);
    if (!p) { fprintf(stderr, "oracle: out of memory\n"); exit(2); }
    return p;
}

static void die(const char *msg) {
    fprintf(stderr, "oracle: %s\n", msg);
    exit(2);
}

static float *take(float **cur, size_t n) {
    float *p = *cur;
    *cur += n;
    return p;
}

static float *load_model(const char *path, Config *c, Weights *w) {
    FILE *f = fopen(path, "rb");
    if (!f) die("cannot open model.bin");
    int32_t hdr[7];
    if (fread(hdr, 4, 7, f) != 7) die("truncated header");
    c->dim = hdr[0]; c->hidden_dim = hdr[1]; c->n_layers = hdr[2];
    c->n_heads = hdr[3]; c->n_kv_heads = hdr[4];
    c->shared_weights = hdr[5] > 0;
    c->vocab_size = hdr[5] > 0 ? hdr[5] : -hdr[5];
    c->seq_len = hdr[6];
    c->head_size = c->dim / c->n_heads;
    c->kv_dim = c->dim * c->n_kv_heads / c->n_heads;
    c->gs = c->n_heads / c->n_kv_heads;

    size_t L = (size_t)c->n_layers, D = (size_t)c->dim;
    size_t H = (size_t)c->hidden_dim, KV = (size_t)c->kv_dim;
    size_t V = (size_t)c->vocab_size, S = (size_t)c->seq_len;
    size_t hd2 = (size_t)c->head_size / 2;
    size_t total = V * D + L * D + 2 * L * D * D + 2 * L * KV * D
        + L * D + 2 * L * H * D + L * D * H + D + 2 * S * hd2
        + (c->shared_weights ? 0 : V * D);
    float *buf = (float *)xmalloc(total * sizeof(float));
    if (fread(buf, sizeof(float), total, f) != total)
        die("truncated weights");
    fclose(f);

    float *cur = buf;
    w->token_embedding = take(&cur, V * D);
    w->rms_att = take(&cur, L * D);
    w->wq = take(&cur, L * D * D);
    w->wk = take(&cur, L * KV * D);
    w->wv = take(&cur, L * KV * D);
    w->wo = take(&cur, L * D * D);
    w->rms_ffn = take(&cur, L * D);
    w->w1 = take(&cur, L * H * D);
    w->w2 = take(&cur, L * D * H);
    w->w3 = take(&cur, L * H * D);
    w->rms_final = take(&cur, D);
    w->freq_cis_real = take(&cur, S * hd2);
    w->freq_cis_imag = take(&cur, S * hd2);
    w->wcls = c->shared_weights ? w->token_embedding : take(&cur, V * D);
    return buf;
}

/* ---------------- kernels (f64 accumulate, f32 store) ------------------- */

static void matmul(float *out, const float *w, const float *x, int d, int n) {
    for (int i = 0; i < d; i++) {
        double acc = 0.0;
        const float *row = w + (size_t)i * n;
        for (int j = 0; j < n; j++) acc += (double)row[j] * (double)x[j];
        out[i] = (float)acc;
    }
}

static void rmsnorm(float *out, const float *x, const float *wt, int size) {
    double ss = 0.0; /* eps INSIDE the sqrt (llama2.ts:176) */
    for (int i = 0; i < size; i++) ss += (double)x[i] * (double)x[i];
    ss /= size;
    double s = 1.0 / sqrt(1e-5 + ss);
    for (int i = 0; i < size; i++)
        out[i] = (float)((double)wt[i] * (s * (double)x[i]));
}

static void softmax_f32(float *x, int size) {
    float m = x[0];
    for (int i = 1; i < size; i++) if (x[i] > m) m = x[i];
    for (int i = 0; i < size; i++)
        x[i] = (float)exp((double)x[i] - (double)m); /* f32 store per elem */
    double sum = 0.0;
    for (int i = 0; i < size; i++) sum += (double)x[i];
    for (int i = 0; i < size; i++) x[i] = (float)((double)x[i] / sum);
}

/* interleaved-pair RoPE over the FULL vector; table row for `pos`,
 * frequency index (i % head_size)/2 (llama2.ts:224-235) */
static void rope(float *vec, int n, int head_size, const float *fcr,
                 const float *fci) {
    for (int i = 0; i < n; i += 2) {
        int fi = (i % head_size) / 2;
        double c = (double)fcr[fi], s = (double)fci[fi];
        double v0 = (double)vec[i], v1 = (double)vec[i + 1];
        vec[i] = (float)(v0 * c - v1 * s);
        vec[i + 1] = (float)(v0 * s + v1 * c);
    }
}

/* ---------------- forward pass (llama2.ts:205-303 semantics) ------------ */

typedef struct {
    float *x, *xb, *xb2, *q, *k, *v, *hb, *hb2, *att, *logits;
    float *key_cache, *value_cache; /* (L, seq_len, kv_dim) each */
} State;

static void state_init(State *s, const Config *c) {
    s->x = (float *)xmalloc(c->dim * sizeof(float));
    s->xb = (float *)xmalloc(c->dim * sizeof(float));
    s->xb2 = (float *)xmalloc(c->dim * sizeof(float));
    s->q = (float *)xmalloc(c->dim * sizeof(float));
    s->k = (float *)xmalloc(c->kv_dim * sizeof(float));
    s->v = (float *)xmalloc(c->kv_dim * sizeof(float));
    s->hb = (float *)xmalloc(c->hidden_dim * sizeof(float));
    s->hb2 = (float *)xmalloc(c->hidden_dim * sizeof(float));
    s->att = (float *)xmalloc(c->seq_len * sizeof(float));
    s->logits = (float *)xmalloc(c->vocab_size * sizeof(float));
    size_t kv = (size_t)c->n_layers * c->seq_len * c->kv_dim;
    s->key_cache = (float *)calloc(kv, sizeof(float));
    s->value_cache = (float *)calloc(kv, sizeof(float));
    if (!s->key_cache || !s->value_cache) die("out of memory (KV cache)");
}

static void forward(int token, int pos, const Config *c, State *s,
                    const Weights *w) {
    int D = c->dim, H = c->hidden_dim, KV = c->kv_dim, hd = c->head_size;
    memcpy(s->x, w->token_embedding + (size_t)token * D, D * sizeof(float));
    const float *fcr = w->freq_cis_real + (size_t)pos * (hd / 2);
    const float *fci = w->freq_cis_imag + (size_t)pos * (hd / 2);
    double inv_sqrt_hd = 1.0 / sqrt((double)hd);

    for (int l = 0; l < c->n_layers; l++) {
        rmsnorm(s->xb, s->x, w->rms_att + (size_t)l * D, D);
        matmul(s->q, w->wq + (size_t)l * D * D, s->xb, D, D);
        matmul(s->k, w->wk + (size_t)l * KV * D, s->xb, KV, D);
        matmul(s->v, w->wv + (size_t)l * KV * D, s->xb, KV, D);
        rope(s->q, D, hd, fcr, fci);
        rope(s->k, KV, hd, fcr, fci);

        float *K = s->key_cache + ((size_t)l * c->seq_len + pos) * KV;
        float *V = s->value_cache + ((size_t)l * c->seq_len + pos) * KV;
        memcpy(K, s->k, KV * sizeof(float));
        memcpy(V, s->v, KV * sizeof(float));

        for (int h = 0; h < c->n_heads; h++) {
            const float *qh = s->q + (size_t)h * hd;
            int off = (h / c->gs) * hd; /* GQA: kv head = h / gs */
            for (int t = 0; t <= pos; t++) {
                const float *kt = s->key_cache
                    + ((size_t)l * c->seq_len + t) * KV + off;
                double acc = 0.0;
                for (int j = 0; j < hd; j++)
                    acc += (double)qh[j] * (double)kt[j];
                s->att[t] = (float)(acc * inv_sqrt_hd);
            }
            softmax_f32(s->att, pos + 1);
            float *oh = s->xb + (size_t)h * hd;
            memset(oh, 0, hd * sizeof(float));
            /* one f32 rounding per timestep, sequential in t */
            for (int t = 0; t <= pos; t++) {
                const float *vt = s->value_cache
                    + ((size_t)l * c->seq_len + t) * KV + off;
                double a = (double)s->att[t];
                for (int j = 0; j < hd; j++)
                    oh[j] = (float)((double)oh[j] + a * (double)vt[j]);
            }
        }

        matmul(s->xb2, w->wo + (size_t)l * D * D, s->xb, D, D);
        for (int i = 0; i < D; i++)
            s->x[i] = (float)((double)s->x[i] + (double)s->xb2[i]);

        rmsnorm(s->xb, s->x, w->rms_ffn + (size_t)l * D, D);
        matmul(s->hb, w->w1 + (size_t)l * H * D, s->xb, H, D);
        matmul(s->hb2, w->w3 + (size_t)l * H * D, s->xb, H, D);
        for (int i = 0; i < H; i++) { /* SiLU, then hadamard — f32 stores */
            double hv = (double)s->hb[i];
            s->hb[i] = (float)(hv * (1.0 / (1.0 + exp(-hv))));
            s->hb[i] = (float)((double)s->hb[i] * (double)s->hb2[i]);
        }
        matmul(s->xb, w->w2 + (size_t)l * D * H, s->hb, D, H);
        for (int i = 0; i < D; i++)
            s->x[i] = (float)((double)s->x[i] + (double)s->xb[i]);
    }

    rmsnorm(s->x, s->x, w->rms_final, D);
    matmul(s->logits, w->wcls, s->x, c->vocab_size, D);
}

/* ---------------- RNG + samplers (llama2.ts:348-394 semantics) ---------- */

static uint64_t rng_state;

static uint32_t random_u32(void) {
    uint64_t s = rng_state;
    s ^= s >> 12;
    s ^= s << 25; /* C uint64 wraps — the reference masks to 64 bits */
    s ^= s >> 27;
    rng_state = s;
    return (uint32_t)((s * 0x2545F4914F6CDD1DULL) >> 32);
}

static float random_f32(void) {
    /* JS computes (u32 / 256) / 2^24 in f64 and the caller rounds to f32 —
     * the fractional bits of /256 survive (NOT llama2.c's integer >>8) */
    return (float)(((double)random_u32() / 256.0) / 16777216.0);
}

static int sample_argmax(const float *p, int n) {
    int best = 0;
    for (int i = 1; i < n; i++) if (p[i] > p[best]) best = i; /* strict > */
    return best;
}

static int sample_mult(const float *p, int n) {
    double total = 0.0;
    for (int i = 0; i < n; i++) total += (double)p[i];
    double r = (double)random_f32() * total;
    double cum = 0.0;
    for (int i = 0; i < n; i++) {
        cum += (double)p[i];
        if (r < cum) return i;
    }
    return 0; /* fallthrough: token 0 */
}

typedef struct { float prob; int index; } ProbIndex;

static int cmp_probindex(const void *a, const void *b) {
    const ProbIndex *x = (const ProbIndex *)a, *y = (const ProbIndex *)b;
    /* prob DESC; ties keep original index order (== JS stable sort) */
    if ((double)y->prob > (double)x->prob) return 1;
    if ((double)y->prob < (double)x->prob) return -1;
    return x->index - y->index;
}

static int sample_topp(const float *p, int n, double topp, ProbIndex *buf) {
    for (int i = 0; i < n; i++) { buf[i].prob = p[i]; buf[i].index = i; }
    qsort(buf, n, sizeof(ProbIndex), cmp_probindex);
    double cum = 0.0;
    int last_idx = 0;
    for (int i = 0; i < n; i++) {
        cum += (double)buf[i].prob;
        if (cum > topp) { last_idx = i; break; }
    }
    double r = (double)random_f32() * cum;
    double walk = 0.0;
    for (int i = 0; i < last_idx; i++) { /* EXCLUSIVE bound */
        walk += (double)buf[i].prob;
        if (r < walk) return buf[i].index;
    }
    return 0; /* fallthrough: RAW token id 0 (not buf[last_idx].index) */
}

/* ---------------- tokenizer (llama2.ts:305-344, :442-449) --------------- */

typedef struct {
    int n;
    char **bytes;  /* raw token bytes */
    int *lens;
    float *scores;
} Vocab;

static void load_tokenizer(const char *path, int vocab_size, Vocab *v) {
    FILE *f = fopen(path, "rb");
    if (!f) die("cannot open tokenizer.bin");
    int32_t maxlen;
    if (fread(&maxlen, 4, 1, f) != 1) die("truncated tokenizer");
    v->n = vocab_size;
    v->bytes = (char **)xmalloc(vocab_size * sizeof(char *));
    v->lens = (int *)xmalloc(vocab_size * sizeof(int));
    v->scores = (float *)xmalloc(vocab_size * sizeof(float));
    for (int i = 0; i < vocab_size; i++) {
        int32_t len;
        if (fread(&v->scores[i], 4, 1, f) != 1 ||
            fread(&len, 4, 1, f) != 1)
            die("truncated tokenizer entry");
        v->bytes[i] = (char *)xmalloc((size_t)len + 1);
        if (len && fread(v->bytes[i], 1, (size_t)len, f) != (size_t)len)
            die("truncated tokenizer bytes");
        v->bytes[i][len] = 0;
        v->lens[i] = len;
    }
    fclose(f);
}

/* first index whose raw bytes equal (str, len); -1 if absent */
static int vocab_index(const Vocab *v, const char *str, int len) {
    for (int i = 0; i < v->n; i++)
        if (v->lens[i] == len && memcmp(v->bytes[i], str, (size_t)len) == 0)
            return i;
    return -1;
}

static int bpe_encode(const Vocab *v, const char *text, int *tokens) {
    int n = 0;
    for (const char *p = text; *p; p++) {
        if ((unsigned char)*p >= 0x80)
            die("non-ASCII prompt byte: the C oracle's raw-byte vocab "
                "lookup matches the reference only for ASCII input");
        int id = vocab_index(v, p, 1);
        if (id < 0) die("prompt character not in vocab");
        tokens[n++] = id;
    }
    char merged[1024];
    for (;;) { /* greedy merges: strictly best score, earliest pair wins */
        float best_score = -1e30f;
        int best_id = -1, best_at = -1;
        for (int i = 0; i + 1 < n; i++) {
            int la = v->lens[tokens[i]], lb = v->lens[tokens[i + 1]];
            if (la + lb >= (int)sizeof(merged)) continue;
            memcpy(merged, v->bytes[tokens[i]], (size_t)la);
            memcpy(merged + la, v->bytes[tokens[i + 1]], (size_t)lb);
            int id = vocab_index(v, merged, la + lb);
            if (id >= 0 && v->scores[id] > best_score) {
                best_score = v->scores[id];
                best_id = id;
                best_at = i;
            }
        }
        if (best_id < 0) break;
        tokens[best_at] = best_id;
        memmove(tokens + best_at + 1, tokens + best_at + 2,
                (size_t)(n - best_at - 2) * sizeof(int));
        n--;
    }
    return n;
}

/* ---------------- generation loop (llama2.ts:460-511 semantics) --------- */

int main(int argc, char **argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: oracle model.bin tokenizer.bin [-s seed] "
                        "[-t temp] [-p topp] [-n steps] [-i prompt]\n");
        return 1;
    }
    double temperature = 1.0, topp = 1.0;
    uint64_t seed = 0;
    int steps = 256;
    const char *prompt = NULL;
    for (int i = 3; i + 1 < argc; i += 2) {
        if (argv[i][0] != '-' || strlen(argv[i]) != 2) return 1;
        switch (argv[i][1]) {
        case 's': seed = (uint64_t)strtoull(argv[i + 1], NULL, 10); break;
        case 't': temperature = strtod(argv[i + 1], NULL); break;
        case 'p': topp = strtod(argv[i + 1], NULL); break;
        case 'n': steps = atoi(argv[i + 1]); break;
        case 'i': prompt = argv[i + 1]; break;
        default: return 1;
        }
    }
    if (seed == 0) seed = (uint64_t)time(NULL) * 1000u;
    rng_state = seed;

    Config c;
    Weights w;
    load_model(argv[1], &c, &w);
    Vocab v;
    load_tokenizer(argv[2], c.vocab_size, &v);
    State s;
    state_init(&s, &c);

    if (steps <= 0 || steps > c.seq_len) steps = c.seq_len;

    int *prompt_tokens = NULL;
    int n_prompt = 0;
    if (prompt && *prompt) {
        prompt_tokens = (int *)xmalloc(strlen(prompt) * sizeof(int));
        n_prompt = bpe_encode(&v, prompt, prompt_tokens);
    }

    ProbIndex *pbuf = (ProbIndex *)xmalloc(
        (size_t)c.vocab_size * sizeof(ProbIndex));
    int token = 1; /* BOS */
    for (int pos = 0; pos < steps; pos++) {
        forward(token, pos, &c, &s, &w);
        int next;
        if (pos < n_prompt) {
            next = prompt_tokens[pos]; /* teacher forcing */
        } else if (temperature == 0.0) {
            next = sample_argmax(s.logits, c.vocab_size);
        } else {
            for (int i = 0; i < c.vocab_size; i++)
                s.logits[i] = (float)((double)s.logits[i] / temperature);
            softmax_f32(s.logits, c.vocab_size);
            if (topp <= 0.0 || topp >= 1.0)
                next = sample_mult(s.logits, c.vocab_size);
            else
                next = sample_topp(s.logits, c.vocab_size, topp, pbuf);
        }
        if (next == 1) break; /* BOS terminates; EOS not special-cased */
        printf("%d\n", next);
        token = next;
    }
    return 0;
}
