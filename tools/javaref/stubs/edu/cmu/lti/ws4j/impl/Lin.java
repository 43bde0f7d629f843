package edu.cmu.lti.ws4j.impl;
import edu.cmu.lti.lexical_db.ILexicalDatabase;
import edu.cmu.lti.ws4j.RelatednessCalculator;
import java.security.MessageDigest;
/**
 * Deterministic stand-in for ws4j's Lin similarity (the ws4j jar and its
 * WordNet data are not available in this sandbox).  Computes EXACTLY the
 * same value as the Python engine's wn_sim stand-in
 * (erex/features.py wn_sim_bucket source values):
 *   - identical lemmas -> 1.5  (> 1, like ws4j Lin(w,w))
 *   - else md5(min|max)[0]/255*0.9  in [0, 0.9]
 * so that EventEventFeatureVector.getDiscreteDoubleWordSimilarity()
 * (reference src, lines 60-66) lands in the same bucket on both sides.
 */
public class Lin extends RelatednessCalculator {
    public Lin(ILexicalDatabase db) { super(db); }
    @Override
    public double calcRelatednessOfWords(String w1, String w2) {
        if (w1.equals(w2)) return 1.5;
        String a = w1.compareTo(w2) <= 0 ? w1 : w2;
        String b = w1.compareTo(w2) <= 0 ? w2 : w1;
        try {
            MessageDigest md = MessageDigest.getInstance("MD5");
            byte[] h = md.digest((a + "|" + b).getBytes("UTF-8"));
            return ((h[0] & 0xFF) / 255.0) * 0.9;
        } catch (Exception e) {
            throw new RuntimeException(e);
        }
    }
}
