package edu.stanford.nlp.util;
/** Minimal stand-in for the single Stanford helper the reference uses
 *  (PairFeatureVector line ~3492: StringUtils.join(list, ",")). */
public class StringUtils {
    public static String join(Iterable<?> items, String sep) {
        StringBuilder sb = new StringBuilder();
        boolean first = true;
        for (Object o : items) {
            if (!first) sb.append(sep);
            sb.append(o == null ? "null" : o.toString());
            first = false;
        }
        return sb.toString();
    }
}
